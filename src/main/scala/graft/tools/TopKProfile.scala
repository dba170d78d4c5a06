package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures q119's execution cost under varying
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` — the
  * round-8 verdict's prime suspect for the 10.3 s driver time: with the
  * default threshold (128 in-memory groups) and ~1,000 suppliers at
  * sf0.1, every ObjectHashAggregate task falls back to sort-based
  * aggregation and re-sorts its whole input, exactly the cost the heap
  * aggregate exists to avoid. Each threshold gets a fresh session (the
  * conf is read at planning) and three timed runs after one warm-up.
  */
object TopKProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    for (threshold <- Seq(128, 4096, 1 << 20)) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
          threshold)
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val q = graft.SparkEntry.queries("q119_topk_agg")
      q(spark, sfDir).count() // warm-up: codegen + parquet footer cache
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"threshold=$threshold%8d  runs=${times.map(t => f"$t%.2f").mkString(",")}  min=${times.min}%.2f s")
      spark.stop()
      // a stopped session leaves the SparkContext cached; clear so the
      // next builder's conf takes effect
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
