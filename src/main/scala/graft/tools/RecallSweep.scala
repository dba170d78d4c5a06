package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Recall@5 trade-off sweep for the LSH / IVF ANN defaults on the real
  * testdata embeddings — the evidence behind the pinned default
  * parameters and recall floors of q29/q50 (an accidental floor is a
  * silent quality knob; this makes it a measured choice).
  *
  * Usage: RecallSweep [sfDir] [nQueries]
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQ = args.lift(1).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.embeddings(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < nQ)

    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val exact = ids(Similarity.bruteForceTopK(emb, qs, "vec_id",
      "embedding", 5))
    println(f"[sweep] corpus n=$n queries=$nQ exact pairs=${exact.size}")

    for ((p, l) <- Seq((2, 1), (3, 1), (4, 1), (5, 1),
        (3, 2), (4, 2), (4, 3), (5, 2), (5, 3), (5, 4), (6, 3), (6, 4))) {
      val (got, t) = timed(ids(Similarity.lshTopK(emb, qs, "vec_id",
        "embedding", dim = 64, k = 5, nPlanes = p, nTables = l)))
      val rec = got.count(exact).toDouble / exact.size
      val frac = 1.0 - math.pow(1.0 - (1.0 + p) / (1 << p), l)
      println(f"[sweep] lsh nPlanes=$p%-2d nTables=$l recall@5=$rec%.3f  scanFrac~$frac%.3f  $t%6.2f s")
    }
    // fixed grid + the faiss-style auto points (4·√n cells, probe a
    // small fraction) — the candidates for scale-aware defaults
    val auto = math.max(16, 4 * math.sqrt(n.toDouble).toInt)
    val autoRows = Seq(8, 16, 25, 33).map(pct =>
      (auto, math.max(1, auto * pct / 100)))
    for ((c, pr) <- Seq((32, 4), (32, 8), (32, 12), (32, 16), (64, 16),
        (64, 24), (64, 28), (64, 32), (64, 40)) ++ autoRows) {
      val (got, t) = timed(ids(Similarity.ivfTopK(emb, qs, "vec_id",
        "embedding", dim = 64, k = 5, nCells = c, nProbe = pr,
        sampleN = math.min(16384, math.max(2048, 8 * c)))))
      val rec = got.count(exact).toDouble / exact.size
      println(f"[sweep] ivf cells=$c%-3d nProbe=$pr%-3d recall@5=$rec%.3f  scanFrac~${pr.toDouble / c}%.3f  $t%6.2f s")
    }
    spark.stop()
  }
}
