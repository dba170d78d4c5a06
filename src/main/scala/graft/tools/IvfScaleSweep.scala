package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** IVF cell/probe sweep at 10⁶ × 64-dim — the evidence for buying the
  * 0.8 recall floor cheaper than the r9 defaults' 44% scan fraction
  * (64 cells / 28 probes). The standard IVF scaling law says more,
  * smaller cells buy the same recall at a smaller scanned fraction as
  * long as the corpus populates them (faiss sizing: nCells ~ 4·√n,
  * probe a √cells-ish count); this measures exactly that on the same
  * clustered 1M corpus as [[AnnScaleProfile]] (1,024 generator centers
  * + 5% noise — realistic embedding geometry).
  *
  * Scan fraction here = nProbe/nCells (cell-balanced corpus; the
  * generator's centers are uniform so cells are even). Training sample
  * grows with the cell count (8·nCells capped at 16,384 — still a
  * bounded driver collect, the faiss IVF pattern).
  *
  * Usage: IvfScaleSweep [nVectors] [nQueries]
  */
object IvfScaleSweep {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nQ = args.lift(1).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same clustered generator as AnnScaleProfile
    def unit(seedA: org.apache.spark.sql.Column,
        scale: Double)(i: org.apache.spark.sql.Column) =
      ((pmod(xxhash64(seedA, i), lit(2000000L)) - lit(1000000L))
        .cast("double") / lit(1000000.0 / scale)).cast("float")
    val vec = transform(sequence(lit(0), lit(63)), i =>
      (unit(pmod(col("id"), lit(1024L)) + lit(7000000L), 1.0)(i) +
        unit(col("id"), 0.05)(i)).cast("float"))
    val corpus = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    val queries = corpus.filter(col("vec_id") < nQ)

    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (exact, tBrute) = timed(ids(
      Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 5)))
    println(f"[ivfsweep] n=$n nQ=$nQ brute=$tBrute%.2f s exact pairs=${exact.size}")

    for ((c, pr) <- Seq((64, 13), (64, 28), (256, 13), (256, 26),
        (256, 51), (1024, 26), (1024, 51), (1024, 102))) {
      val sampleN = math.min(16384, math.max(2048, 8 * c))
      val (got, t) = timed(ids(Similarity.ivfTopK(corpus, queries,
        "vec_id", "embedding", dim = 64, k = 5, nCells = c, nProbe = pr,
        sampleN = sampleN)))
      val rec = got.count(exact).toDouble / exact.size
      println(f"[ivfsweep] cells=$c%-4d probe=$pr%-3d " +
        f"scanFrac=${pr.toDouble / c}%.3f recall@5=$rec%.3f $t%7.2f s " +
        f"(sample=$sampleN)")
    }
    spark.stop()
  }
}
