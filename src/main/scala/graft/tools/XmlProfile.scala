package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Splits q101's XML round-trip into write vs read+agg phases — chasing
  * the r6→r8 driver regression (2.28 s → 3.77 s) to decide whether it
  * is plan cost or host contention.
  */
object XmlProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_xmlprof", "xml").toString
    val o = graft.Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderstatus"),
      (col("o_totalprice").cast("decimal(14,2)") * 100).cast("long")
        .as("cents"))
    o.count() // warm parquet path
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      o.write.mode("overwrite").format("xml")
        .option("rootTag", "orders").option("rowTag", "order").save(path)
      val t1 = System.nanoTime()
      s.read.format("xml").option("rowTag", "order").schema(o.schema)
        .load(path)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
        .count()
      val t2 = System.nanoTime()
      println(f"run $i: write=${(t1 - t0) / 1e9}%.2f s  read+agg=${(t2 - t1) / 1e9}%.2f s")
    }
    s.stop()
  }
}
