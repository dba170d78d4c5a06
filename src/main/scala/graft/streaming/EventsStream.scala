package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming form of the events pipeline (SURVEY.md §2.1 #13:
  * the reference's `search_after` micro-batch pull loop is exactly Spark's
  * incremental-source pattern — here modeled with a file source +
  * `Trigger.AvailableNow`).
  *
  * The batch-equivalent aggregation lives in Relational.q16; this module
  * runs the REAL streaming machinery (source → watermark → event-time
  * window → stateful aggregation → sink) so the driver can verify the
  * streaming path produces byte-identical results to the batch oracle.
  * The source (and its ts physical-vintage handling) is the shared
  * [[EventsSource]].
  */
object EventsStream {

  /** 15-minute tumbling-window counts/sums per event_type, computed by a
    * streaming query over the events parquet and materialized through a
    * memory sink. `AvailableNow` processes the whole file then stops —
    * the finite-input form of a continuous deployment.
    */
  def windowedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    // streaming state cost scales with state-store instances (= shuffle
    // partitions at query start); this aggregation state is tiny, so a
    // handful of partitions beats the batch-tuned default. Restored after
    // the (synchronous, finite) run.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val name = "events_win_" + UUID.randomUUID().toString.replace("-", "")
    val stream = EventsSource.stream(spark, sfDir)
      .withWatermark("ts", "30 days")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // integer-exact output: raw-double sums are order-dependent and
        // doubles formed by engine arithmetic are not hash-portable
        sum((col("value").cast("decimal(14,2)") * lit(100).cast("decimal(3,0)"))
          .cast("long")).as("total_value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"),
        col("event_type"), col("n"), col("total_value_cents"))
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(name)
  }

  /** SLIDING (hopping) windows — 15-minute width, 5-minute slide: every
    * event contributes to width/slide = 3 overlapping windows. Same
    * source → watermark → stateful-agg → memory-sink machinery as
    * [[windowedAgg]]; state holds ~3× the tumbling window count (the
    * overlap factor), still bounded by the watermark. The batch/DuckDB
    * replay is the 3-offset bucket expansion (each event cross-joined
    * to its k ∈ {0,1,2} candidate window starts) — q114 pins equality.
    */
  def slidingAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val name = "events_slide_" + UUID.randomUUID().toString.replace("-", "")
    val stream = EventsSource.stream(spark, sfDir)
      .withWatermark("ts", "30 days")
      .groupBy(window(col("ts"), "15 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value").cast("decimal(14,2)") * lit(100).cast("decimal(3,0)"))
          .cast("long")).as("total_value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("win_start"),
        col("event_type"), col("n"), col("total_value_cents"))
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.table(name)
  }
}
