package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Spark-job counts per declared query (guide §1: measure first) — the
  * round-18 evidence for "fewer jobs per iteration / per search":
  * runs each named query under the exact Bench session conf with a job
  * listener, printing cold and warm wall plus the number of jobs and
  * summed job time, so driver-side scheduling floors are separable
  * from real compute.
  *
  * Usage: sbt "runMain graft.tools.JobCount q117_pagerank q118_label_prop"
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        1 << 20)
      .config("spark.sql.codegen.cache.maxEntries", 10000)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val verbose = sys.env.get("JOB_COUNT_VERBOSE").contains("1")
    val starts =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.map(_.name).mkString(" | ").take(110)
        starts.put(j.jobId, (System.nanoTime(), site)): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        jobs += 1
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          val d = System.nanoTime() - t0
          jobNanos += d
          if (verbose)
            println(f"    job ${j.jobId}%4d ${d / 1e9}%6.3f s  $site")
        }
      }
    })

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q117_pagerank", "q118_label_prop")
    for (name <- names) {
      val q = graft.SparkEntry.queries(name)
      def drop(): Unit = {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
      for (run <- 0 to 2) {
        Thread.sleep(80) // drain listener events
        val (j0, n0) = (jobs, jobNanos)
        val t0 = System.nanoTime()
        q(spark, sfDir).count(): Unit
        Thread.sleep(80)
        val wall = (System.nanoTime() - t0) / 1e9
        val js = jobs - j0
        val jt = (jobNanos - n0) / 1e9
        val tag = if (run == 0) "cold" else s"warm$run"
        println(f"[jobcount] $name%-28s $tag%-6s wall=$wall%6.2f s  " +
          f"jobs=$js%3d  jobtime=$jt%6.2f s")
        drop()
      }
    }
    spark.stop()
  }
}
