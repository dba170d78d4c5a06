package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vintage-adaptive streaming reader for the events feed.
  *
  * The driver's `events.parquet` has shipped `ts` in two physical
  * vintages: parquet TIMESTAMP(NANOS) — readable only as int64
  * epoch-nanos under `spark.sql.legacy.parquet.nanosAsLong` — and plain
  * TIMESTAMP(MICROS), which Spark infers as TIMESTAMP_NTZ. A streaming
  * source requires a user-declared schema, which would bake one vintage
  * in; declaring the nanos shape against a micros file silently reads
  * the raw int64 micros as "nanos" and skews every event time 1000×.
  *
  * So every streaming module funnels through here: probe the footer once
  * (batch-side, driver-only), declare the matching stream schema, and
  * normalize to ONE logical contract — `ts: TimestampType` on the
  * MICROSECOND grid (the NTZ wall-clock is re-rendered from UTC into
  * the session tz before its LTZ cast, so the instant is the stored
  * UTC micros under any session timezone; the nanos long floors to
  * micros — the q72/q91 shared grid). Test feeds that write plain
  * int64 epoch-nanos
  * columns (the eviction/CDC specs) probe as LongType and take the nanos
  * path unchanged.
  */
object EventsSource {

  private def schemaFor(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Batch-probe the resolved `ts` type. The legacy nanos flag is set for
    * the probe and restored immediately (a no-op for micros files; for a
    * NANOS file it turns the otherwise-fatal PARQUET_TYPE_ILLEGAL into a
    * LongType read — and execution clips the file schema against the
    * resolved one without re-reading the conf, see `graft.Tables`).
    */
  def rawTsType(spark: SparkSession, dir: String, glob: String): DataType = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try spark.read.option("pathGlobFilter", glob).parquet(dir)
      .schema("ts").dataType
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** File-stream over `dir` (narrowed by `glob`) with `ts` normalized to
    * microsecond `TimestampType`; all other columns as the feed declares
    * them. `maxFilesPerTrigger > 0` chops the source into that-many-file
    * micro-batches (tests use 1 to force multi-batch runs).
    */
  def stream(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val t = rawTsType(spark, dir, glob)
    val reader = spark.readStream
      .schema(schemaFor(t))
      .option("pathGlobFilter", glob)
    if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    val raw = reader.parquet(dir)
    t match {
      case LongType => // epoch-nanos int64 → floor to the micros grid
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // micros vintage: NTZ wall-clock = UTC instant; reinterpret
        // under an explicit UTC zone — DST-proof, same rule as
        // `graft.Tables` ([[graft.functions.TimeOps.ntzUtcToInstant]])
        raw.withColumn("ts",
          graft.functions.TimeOps.ntzUtcToInstant(col("ts")))
      case _ => raw
    }
  }
}
