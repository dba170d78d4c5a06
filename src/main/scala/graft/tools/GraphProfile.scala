package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for the iterative graph queries (q117/q118):
  * edge build + one-shuffle layout vs the per-round join/agg loop, and
  * the effect of join strategy on the round joins. Chases the round-8
  * verdict's 8.4 s / 6.0 s driver measurements.
  */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val o = graft.Tables.orders(s, sfDir)
    val l = graft.Tables.lineitem(s, sfDir)
    val pairs = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
    val edges = pairs
      .select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionByName(pairs
        .select((col("sk") * 2 + 1).as("src"), (col("ck") * 2).as("dst")))

    // warm-up
    edges.count()

    for (round <- 1 to 2) {
      println(s"— sweep $round —")
      t("edge count (join only)") { edges.count() }
      val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
        .repartition(col("src")).dropDuplicates("src", "dst")
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val ed = t("layout persist (e+deg join)") {
        val x = e.join(deg, "src").persist(); x.count(); x
      }
      val nodes = t("nodes distinct persist") {
        val x = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct().persist()
        x.count(); x
      }
      var ranks = nodes.withColumn("pr", lit(1000000000L))
      for (i <- 1 to 3) {
        ranks = t(s"round $i") {
          val shares = ed
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .selectExpr("dst AS node", "((pr * 85) div 100) div outdeg AS share")
          val r = shares
            .unionByName(nodes.withColumn("share", lit(0L)))
            .groupBy("node").agg(sum("share").as("in_mass"))
            .select(col("node"), (lit(150000000L) + col("in_mass")).as("pr"))
            .persist()
          r.count()
          r
        }
      }
      ed.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
