package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 bisect of the q117 regression (BENCH_r10 7.0 s →
  * BENCH_r11 17.0 s): round 11 changed `Graph.pageRank` from
  * per-round materialization to `materializeEvery = 4` — which, at
  * q117's `iters = 3`, removes EVERY intermediate materialization and
  * submits one 3-round-deep lazy plan. The breakdown tool's warm runs
  * (2.4 s) looked great, but the BENCH scoreboard sees the COLD first
  * run (fresh expr-id plan, fresh codegen, AQE stage-by-stage
  * replanning of the deep tree), and QueryTime measured that cold run
  * at 14 s under r11 code.
  *
  * This sweep times q117's exact pageRank call cold for one
  * `materializeEvery` value per JVM (`runMain graft.tools.GraphMatSweep
  * <K>`): within a JVM the second run would hit the codegen cache, so
  * cross-K comparisons must each come from a fresh process.
  */
object GraphMatSweep {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        1 << 20)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
    // SPARK_GRAFT_AQE=false isolates how much of the iterative queries'
    // wall is AQE's per-query-stage job submission on the driver
    // (normalized: any non-true/false value would otherwise kill the
    // sweep with Spark's conf-parse error before it starts)
    sys.env.get("SPARK_GRAFT_AQE").map(_.trim.toLowerCase).foreach {
      case v @ ("true" | "false") =>
        builder.config("spark.sql.adaptive.enabled", v): Unit
      case other => sys.error( // a silently-dropped typo would run the
        // A/B baseline with AQE ON while the operator believes it off
        s"SPARK_GRAFT_AQE='$other' is not true/false — refusing to run " +
          "the sweep with a misconfigured baseline")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the bench's warm-up (codegen compiler + parquet paths), as in Bench
    try graft.SparkEntry.queries("q04_star_join")(spark, sfDir).count(): Unit
    catch { case _: Throwable => () }

    def edges = {
      val o = graft.Tables.orders(spark, sfDir)
      val l = graft.Tables.lineitem(spark, sfDir)
      val pairs = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      pairs.select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .unionByName(pairs
          .select((col("sk") * 2 + 1).as("src"), (col("ck") * 2).as("dst")))
    }
    def drop(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val t0 = System.nanoTime()
    graft.operators.Graph.pageRank(edges, iters = 3,
      materializeEvery = k).count(): Unit
    val cold = (System.nanoTime() - t0) / 1e9
    drop()
    val warm = (1 to 2).map { _ =>
      val t = System.nanoTime()
      graft.operators.Graph.pageRank(edges, iters = 3,
        materializeEvery = k).count(): Unit
      val s = (System.nanoTime() - t) / 1e9
      drop()
      s
    }
    println(f"[matsweep] K=$k cold=$cold%.2f s warm=${warm.map(t => f"$t%.2f").mkString(",")} s")
    spark.stop()
  }
}
