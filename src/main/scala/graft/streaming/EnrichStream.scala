package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Stream-static enrichment join: a streaming event feed joined to a
  * static dimension (the lookup/enrichment stage every streaming ingest
  * pipeline has). The dimension side is a plain batch DataFrame — Spark
  * broadcasts it into each micro-batch, so the stream is never shuffled
  * for the join and the state store holds only the post-join aggregation.
  */
object EnrichStream {

  /** Count + decimal-exact value sum per (market segment, event_type):
    * stream events enriched with the customer dimension on
    * user_id = c_custkey, aggregated in complete mode.
    */
  def enrichedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val name = "enrich_stream_" + UUID.randomUUID().toString.replace("-", "")
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val out = EventsSource.stream(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        col("value").cast("decimal(14,2)").as("value"))
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // integer-exact output: decimal cents summed as longs (see q18/q32
        // — doubles formed by engine arithmetic are not hash-portable)
        sum((col("value") * lit(100).cast("decimal(3,0)")).cast("long"))
          .as("total_value_cents"))
    val q = out.writeStream
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
