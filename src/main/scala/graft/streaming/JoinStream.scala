package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Watermarked STREAM-STREAM inner join — the attribution shape (which
  * view led to a purchase within the window) that completes the
  * streaming surface: windowed agg (`EventsStream`), stateful sessions
  * (`SessionStream`), dedup (`DedupStream`), stream-STATIC enrich
  * (`EnrichStream`), and now two live streams joined against each
  * other's buffered state.
  *
  * Scale design: both sides carry watermarks and the join condition
  * bounds event time on BOTH ends, so Spark derives state-eviction
  * watermarks for each side — state holds only the last `windowMinutes`
  * of views/purchases per key instead of growing forever. The join keys
  * include the equality key (user), so state is hash-partitioned by user
  * across executors; no broadcast, no unbounded buffer.
  */
object JoinStream {

  private def sourceStream(spark: SparkSession, sfDir: String,
      glob: String): DataFrame =
    EventsSource.stream(spark, sfDir, glob)

  /** The UNSTARTED view→purchase join: exposed so tests can drive their
    * own micro-batches (file-by-file) and inspect state-store metrics —
    * the eviction contract ("state holds only the last `windowMinutes`
    * per key") is pinned by JoinStreamEvictionSpec feeding two batches
    * under a tight `watermarkDelay` and asserting late-row drops plus a
    * bounded state-row count. `viewPurchase` wraps this with the
    * batch-parity defaults.
    */
  def viewPurchaseJoined(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 30, watermarkDelay: String = "30 days",
      glob: String = "events.parquet"): DataFrame = {
    val views = sourceStream(spark, sfDir, glob)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    val purchases = sourceStream(spark, sfDir, glob)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    views.join(purchases,
      expr(s"""v_user = p_user AND
               p_ts >= v_ts AND
               p_ts <= v_ts + interval $windowMinutes minutes"""))
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"))
  }

  /** view→purchase attribution: every (view, purchase) pair of the same
    * user with the purchase inside [view_ts, view_ts + windowMinutes].
    * Output (user_id, view_id, purchase_id) — byte-comparable to the
    * batch self-join oracle.
    */
  def viewPurchase(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 30): DataFrame = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val name = "vp_join_" + UUID.randomUUID().toString.replace("-", "")
    val joined = viewPurchaseJoined(spark, sfDir, windowMinutes)
    val q = joined.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
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
