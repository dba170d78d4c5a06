package graft.tools

import org.apache.spark.sql.SparkSession

/** Partitioning-sensitivity sweep for the ITERATIVE operators — the ops
  * whose bit-reproducibility claims rest on exact integer arithmetic
  * (fixed-point k-means q115, integer-mass PageRank q117, min-label
  * propagation q118): runs each query under a local[4] session and a
  * local[32] session (different partition counts, task boundaries, and
  * merge orders end to end) and compares the FULL result set. Exits 1 on
  * any divergence. Default shuffle partitions track the core count, so
  * the two runs also exercise 4 vs 32 shuffle partitions.
  *
  * This is the per-round gate behind "bit-identical under any
  * partitioning" (COVERAGE.md) — floating-point aggregation would fail
  * it on the first run.
  */
object PartitionSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q115_kmeans_fixedpoint", "q117_pagerank", "q118_label_prop")

    def resultsUnder(cores: Int): Map[String, Seq[String]] = {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.sql.session.timeZone", "UTC")
        .config(
          "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          1 << 20)
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try names.map { n =>
        val rows = graft.SparkEntry.queries(n)(spark, sfDir)
          .collect().map(_.toSeq.map(String.valueOf).mkString("\u0001"))
          .sorted.toSeq
        n -> rows
      }.toMap
      finally spark.stop()
    }

    val at4 = resultsUnder(4)
    val at32 = resultsUnder(32)
    var failed = false
    for (n <- names) {
      val (a, b) = (at4(n), at32(n))
      val ok = a == b
      if (!ok) failed = true
      println(s"[psweep] $n local[4]=${a.size} rows local[32]=${b.size} rows " +
        (if (ok) "IDENTICAL" else "DIVERGED: " +
          a.zipAll(b, "<missing>", "<missing>")
            .collectFirst { case (x, y) if x != y => s"first diff: $x vs $y" }
            .getOrElse("row-count mismatch")))
    }
    if (failed) sys.exit(1)
  }
}
