package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for the `Tables.events` session-conf hygiene pattern:
  * the `spark.sql.legacy.parquet.nanosAsLong` flag is set for the
  * nanosecond-timestamp parquet read and restored in a `finally` BEFORE
  * the returned DataFrame is ever materialized. That is safe on the
  * pinned Spark version because the flag is consulted only during schema
  * inference — but upstream `ParquetFileFormat.buildReaderWithPartitionValues`
  * copies session conf into the scan's hadoopConf at first-action time in
  * some Spark lineages, so a version bump could silently reintroduce
  * PARQUET_TYPE_ILLEGAL at action time. This spec materializes an events
  * DataFrame strictly AFTER the loader returned (conf already restored),
  * so any such regression fails loudly here instead of inside a query.
  */
class TablesConfSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("events DataFrame materializes after the nanos conf is restored") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val df = graft.Tables.events(spark, sf)
    // the loader must not leak the flag into session conf
    assert(spark.conf.getOption(key) === before)
    // first action runs strictly after the finally restored the conf —
    // this is the call that would throw PARQUET_TYPE_ILLEGAL if execution
    // re-read the (restored) session conf
    assert(df.count() > 0)
    val maxTs = df.selectExpr("max(ts)").collect().head.get(0)
    assert(maxTs != null)
  }

  test("events ts instants are session-timezone independent") {
    // the stored micros are UTC instants; a loader that casts NTZ→LTZ
    // through the session tz would shift every instant by the zone
    // offset. unix_micros reads the instant, not the rendering, so the
    // two reads must agree exactly.
    val tzKey = "spark.sql.session.timeZone"
    val before = spark.conf.get(tzKey)
    val utc =
      try {
        spark.conf.set(tzKey, "UTC")
        graft.Tables.events(spark, sf)
          .selectExpr("min(unix_micros(ts))", "max(unix_micros(ts))")
          .collect().head
      } finally spark.conf.set(tzKey, before)
    val offset =
      try {
        spark.conf.set(tzKey, "America/New_York")
        graft.Tables.events(spark, sf)
          .selectExpr("min(unix_micros(ts))", "max(unix_micros(ts))")
          .collect().head
      } finally spark.conf.set(tzKey, before)
    assert(utc === offset)
  }

  test("DST fall-back overlap instants stay distinct under a non-UTC session") {
    // Two UTC instants one hour apart whose America/New_York wall-clocks
    // are BOTH 01:30 (the repeated hour of the 2025-11-02 fall-back). A
    // loader that round-trips NTZ→session-wall-clock→LTZ collapses them
    // onto one offset and shifts the later instant by an hour; the
    // explicit-UTC reinterpret must keep them exactly one hour apart.
    val dir = java.nio.file.Files.createTempDirectory("graft_dst").toString
    val tzKey = "spark.sql.session.timeZone"
    val before = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      spark.sql(
        """SELECT TIMESTAMP_NTZ'2025-11-02 05:30:00' AS ts
           UNION ALL SELECT TIMESTAMP_NTZ'2025-11-02 06:30:00'""")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = graft.Tables.events(spark, dir)
        .selectExpr("unix_micros(ts)").collect()
        .map(_.getLong(0)).sorted.toSeq
      val expected = Seq("2025-11-02T05:30:00Z", "2025-11-02T06:30:00Z")
        .map(t => java.time.Instant.parse(t).toEpochMilli * 1000L)
      assert(got === expected)
    } finally spark.conf.set(tzKey, before)
  }
}
