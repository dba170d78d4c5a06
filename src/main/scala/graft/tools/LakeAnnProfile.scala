package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.operators.Similarity
import graft.sinks.Lake

/** Scale evidence for the ANN-over-the-lake refine scan (q122,
  * `Similarity.pqTopKOverLake`) at 10⁶ × 64-dim: does the id-sorted,
  * bloom-indexed layout actually turn the exact re-rank into a
  * row-group point lookup instead of a second full float scan?
  *
  * Measured, not inferred (COVERAGE.md evidentiary standard):
  *   - full float scan (the refine cost WITHOUT the layout) vs the
  *     id-list-pruned scan over the same lake, identical aggregate;
  *   - end-to-end pqTopKOverLake vs in-memory pqTopK, result equality
  *     asserted at 10⁶ rows.
  *
  * Corpus geometry matches [[AnnScaleProfile]] (1024 seeded clustered
  * centers + noise — uniform 64-dim vectors have no meaningful
  * neighbors at this scale). `parquet.pushdown.inFilterThreshold` is
  * raised past the shortlist size so the In filter reaches parquet's
  * row-group machinery (column index + bloom) — the knob the operator
  * Scaladoc documents.
  *
  * Usage: LakeAnnProfile [nVectors] [nQueries]
  */
object LakeAnnProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nQ = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // push the shortlist-sized IN list all the way into parquet
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "2048")
      // plain plans so scan metrics are directly collectible
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[lakeann] $label%-34s $s%8.2f s")
      (r, s)
    }

    // clustered corpus: center(id % 1024) + 5% noise — AnnScaleProfile's recipe
    def unit(seedA: org.apache.spark.sql.Column,
        scale: Double)(i: org.apache.spark.sql.Column) =
      ((pmod(xxhash64(seedA, i), lit(2000000L)) - lit(1000000L))
        .cast("double") / lit(1000000.0 / scale)).cast("float")
    val vec = transform(sequence(lit(0), lit(63)), i =>
      (unit(pmod(col("id"), lit(1024L)) + lit(7000000L), 1.0)(i) +
        unit(col("id"), 0.05)(i)).cast("float"))
    val corpus = spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))

    // shortlist-shaped id set: nQ * 20 ids spread over the id range —
    // the worst case for pruning (every file potentially touched; the
    // win comes from row-group granularity, not file skipping). The
    // touched fraction is ~ |shortlist| / #rowGroups once groups are
    // small enough that each id hits its own group — the quantity that
    // goes to ~0 at real scale, where #rowGroups grows with the corpus
    // and the shortlist does not.
    val ids: Array[Long] =
      (0 until nQ * 20).map(i => (i.toLong * 48271L + 11L) % n).toArray.distinct.sorted
    println(s"[lakeann] corpus n=$n shortlist=${ids.length} ids")

    // Wall time lies here (the whole corpus fits in page cache); the
    // honest metric is rows the parquet READER surfaces — after
    // row-group pruning by column index + bloom, before Spark's own
    // Filter — i.e. how much of the lake the refine actually decodes.
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }

    var dir: String = null
    for (rgBytes <- Seq(1L << 20, 256L << 10, 64L << 10)) {
      val d = java.nio.file.Files.createTempDirectory("lakeann_").toString
      time(f"writeAnnLake rowGroup=${rgBytes >> 10}%dKB") {
        Lake.writeAnnLake(corpus, d, "vec_id", nFiles = 32,
          rowGroupBytes = rgBytes)
      }
      val lake = spark.read.parquet(d)
      val pruned = scanRows(
        lake.filter(col("vec_id").isin(ids.map(_.asInstanceOf[Any]): _*))
          .agg(sum(element_at(col("embedding"), 1))))
      println(f"[lakeann] rowGroup=${rgBytes >> 10}%4dKB refine scan " +
        f"decoded $pruned%,d of $n%,d rows (${pruned.toDouble / n}%.4f " +
        f"of the lake) for ${ids.length} shortlist ids")
      if (dir == null) dir = d // 1MB-layout lake reused for end-to-end
    }

    val queries = corpus.filter(col("vec_id") < nQ)
    val (lakeRes, tLake) = time("pqTopKOverLake end-to-end") {
      Similarity.pqTopKOverLake(spark, dir, queries, "vec_id",
        "embedding", dim = 64, k = 5, m = 16, ksub = 16, refine = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val (memRes, tMem) = time("pqTopK in-memory end-to-end") {
      Similarity.pqTopK(corpus, queries, "vec_id", "embedding",
        dim = 64, k = 5, m = 16, ksub = 16, refine = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    require(lakeRes == memRes,
      s"lake result diverged: ${lakeRes.size} vs ${memRes.size} rows")
    println(f"[lakeann] lake == memory at n=$n (${lakeRes.size} rows); " +
      f"lake $tLake%.2f s vs memory $tMem%.2f s")
    spark.stop()
  }
}
