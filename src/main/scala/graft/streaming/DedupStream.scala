package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming exact deduplication — `dropDuplicates` keyed on the event id
  * over a stream that intentionally delivers every event TWICE (the
  * at-least-once shape of real ingestion: replayed pages, redelivered
  * messages). State per key is just the key, so a watermark bounds it in a
  * continuous deployment; the finite `AvailableNow` run here keeps full
  * state and must reproduce the batch `GROUP BY` exactly — which is what
  * the driver oracle checks.
  */
object DedupStream {

  /** Per-type counts/sums AFTER dedup of a doubled events stream. The
    * duplicate feed is two file-stream reads of the same parquet unioned —
    * two independent sources, so every event id arrives exactly twice.
    */
  def dedupCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val name = "dedup_stream_" + UUID.randomUUID().toString.replace("-", "")
    def src() = EventsSource.stream(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(14,2)")).as("value"))
    val deduped = src().unionByName(src())
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        // integer-exact output: decimal cents summed as longs (see q18/q32
        // — doubles formed by engine arithmetic are not hash-portable)
        sum((col("value") * lit(100).cast("decimal(3,0)")).cast("long"))
          .as("total_value_cents"))
    val q = deduped.writeStream
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
