package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: what Spark's parquet writer records in footer
  * statistics for each manifest-stats-supported type (incl. NaN, -0.0,
  * long strings, all-null, timestamps, decimals) — the ground truth the
  * footer-based statEntries fast path must match scan-derived stats on.
  */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("footerprobe")
    val out = dir.resolve("t").toString
    val big = "\u00ff" * 5000 // 2-byte UTF-8 each: 10 KB min+max
    val df = Seq(
      (1L, big + "AAA", -0.0, -0.0f, BigDecimal("12345.6789"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456"),
        Option.empty[String], Option("x")),
      (-7L, big + "BBB", 0.0, 0.0f, BigDecimal("-0.0001"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        Option.empty[String], Option.empty[String]),
      (42L, big + "CCC", Double.NegativeInfinity, Float.PositiveInfinity,
        BigDecimal("99999999999999.9999"),
        java.sql.Timestamp.valueOf("2030-06-15 12:00:00"),
        Option.empty[String], Option("a"))
    ).toDF("l", "s", "d", "f", "dec", "ts", "allnull", "somenull")
      .withColumn("dec", col("dec").cast("decimal(20,4)"))
    df.coalesce(1).write.mode("overwrite").parquet(out)
    val file = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    val conf = spark.sessionState.newHadoopConf()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val fm = r.getFooter.getFileMetaData
      println("schema:\n" + fm.getSchema)
      r.getFooter.getBlocks.forEach { b =>
        println(s"rowGroup rows=${b.getRowCount}")
        b.getColumns.forEach { c =>
          val st = c.getStatistics
          println(s"  col=${c.getPath} type=${c.getPrimitiveType}" +
            s" stats=${Option(st).map(s => s"nulls=${s.getNumNulls} " +
              s"hasNonNull=${s.hasNonNullValue} " +
              s"min=${if (s.hasNonNullValue) s.genericGetMin else "-"} " +
              s"max=${if (s.hasNonNullValue) s.genericGetMax else "-"}")
              .getOrElse("NONE")}")
        }
      }
    } finally r.close()
    // scan-derived comparison (what statEntries computes today)
    val agg = df.agg(
      min($"l"), max($"l"), min($"s"), max($"s"),
      min($"d".cast("double")), max($"d".cast("double")),
      min($"f".cast("double")), max($"f".cast("double")),
      min($"dec"), max($"dec"),
      min(unix_micros($"ts")), max(unix_micros($"ts")),
      min($"somenull"), max($"somenull"))
    agg.collect().foreach(r => println("scan: " + r))
    spark.stop()
  }
}
