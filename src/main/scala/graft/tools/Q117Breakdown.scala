package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Root-cause instrumentation for the q117 driver-vs-local 2× gap (the
  * one open perf mystery from rounds 9–10): q117's driver-protocol
  * number has sat ~2× above fresh-JVM local runs of the SAME code for
  * two rounds. Hypotheses: (a) JVM/session pressure accumulated over
  * the 116 queries that run before it in the bench's sorted order —
  * codegen cache, GC load, scheduler contention; (b) some component of
  * task time itself (shuffle, compute) inflating under the loaded
  * session.
  *
  * Protocol — the bench's EXACT session (same master/configs/
  * extensions, same warm-up, same dropCaches between queries):
  *
  *  1. run q117 three times FRESH (right after warm-up), with a task
  *     listener decomposing wall time into executor run / GC /
  *     deserialize / result-serialize / scheduler-delay, plus the
  *     driver-side remainder (wall − task-time/cores);
  *  2. replay the full bench PREFIX (every query sorted before q117,
  *     once each, untimed — exactly what the driver protocol executes
  *     before reaching q117);
  *  3. run q117 three times again under that accumulated pressure, same
  *     decomposition.
  *
  * first-vs-after-prefix IS the position effect; the component deltas
  * name what carries it. Published in COVERAGE.md.
  */
object Q117Breakdown {

  private final class TaskAcc extends SparkListener {
    @volatile var tasks = 0L
    @volatile var jobs = 0L
    @volatile var stages = 0L
    @volatile var runMs = 0L
    @volatile var gcMs = 0L
    @volatile var deserMs = 0L
    @volatile var resSerMs = 0L
    @volatile var schedMs = 0L
    @volatile var fetchWaitMs = 0L
    @volatile var shuffleWriteMs = 0L
    override def onJobStart(
        e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs += 1
      stages += e.stageInfos.size
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null && e.taskInfo != null) {
        val m = e.taskMetrics
        tasks += 1
        runMs += m.executorRunTime
        gcMs += m.jvmGCTime
        deserMs += m.executorDeserializeTime
        resSerMs += m.resultSerializationTime
        fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
        shuffleWriteMs += m.shuffleWriteMetrics.writeTime / 1000000L
        val d = e.taskInfo.duration - m.executorRunTime -
          m.executorDeserializeTime - m.resultSerializationTime
        schedMs += math.max(0L, d)
      }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        1 << 20)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    def dropCaches(): Unit = {
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def run(name: String): Unit = {
      graft.SparkEntry.queries(name)(spark, sfDir).count(): Unit
      dropCaches()
    }

    // the bench's warm-up
    try run("q04_star_join") catch { case _: Throwable => () }

    def timed(query: String, tag: String): Unit = (1 to 3).foreach { i =>
      val acc = new TaskAcc
      sc.addSparkListener(acc)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, sfDir).count(): Unit
      val wallMs = (System.nanoTime() - t0) / 1e6
      // listener delivery is async; give the bus a moment to drain
      Thread.sleep(500)
      sc.removeSparkListener(acc)
      dropCaches()
      val perCore = acc.runMs.toDouble / cpus
      println(f"[q117] $query $tag%-12s run$i wall=${wallMs / 1000}%6.2f s  " +
        f"jobs=${acc.jobs}%3d stages=${acc.stages}%3d " +
        f"tasks=${acc.tasks}%5d  taskRun=${acc.runMs / 1000.0}%7.1f s " +
        f"(÷$cpus cores=${perCore / 1000}%5.2f s)  gc=${acc.gcMs / 1000.0}%5.1f s  " +
        f"deser=${acc.deserMs / 1000.0}%5.1f s  sched=${acc.schedMs / 1000.0}%6.1f s  " +
        f"fetchWait=${acc.fetchWaitMs / 1000.0}%5.1f s  " +
        f"shufWrite=${acc.shuffleWriteMs / 1000.0}%5.1f s  " +
        f"driverGap=${(wallMs - perCore) / 1000}%5.2f s")
    }
    def timed117(tag: String): Unit = timed("q117_pagerank", tag)

    timed117("fresh")
    // controls, same decomposition: the sibling iterative query and a
    // single-plan compute-bound query — the contrast in driverGap /
    // wall fraction is the evidence
    timed("q118_label_prop", "control")
    timed("q115_kmeans_fixedpoint", "control")
    timed("q01_agg_fullscan", "control")
    val prefix = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .map(_._1).filter(_ < "q117")
    println(s"[q117] replaying ${prefix.length}-query bench prefix ...")
    val tp = System.nanoTime()
    prefix.foreach { n =>
      try run(n)
      catch { case e: Throwable =>
        println(s"[q117] prefix $n failed: ${e.getMessage}") }
    }
    println(f"[q117] prefix done in ${(System.nanoTime() - tp) / 1e9}%.0f s")
    timed117("afterPrefix")
    spark.stop()
  }
}
