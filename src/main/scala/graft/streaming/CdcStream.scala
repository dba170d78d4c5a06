package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.Cdc

/** Streaming CDC ingestion into a versioned lake snapshot — the
  * `foreachBatch` maintenance loop that turns an event stream into a
  * continuously-merged current-state table (the streaming twin of the
  * batch q72 merge; the reference only ever appends,
  * `ElasticSearch ETL.py:247-257`).
  *
  * Each micro-batch is folded into the snapshot with
  * [[Cdc.mergeVersioned]] — seq-aware and tombstone-retaining, so the
  * result is INDEPENDENT of how the stream happens to be chopped into
  * batches (an out-of-order change in a later batch loses to the
  * higher-seq row already merged; a stale upsert cannot resurrect a
  * tombstoned key) and idempotent under at-least-once redelivery.
  * Versions are written copy-on-write (`v0, v1, …` dirs): readers
  * always see a complete snapshot, the previous version survives any
  * mid-write crash, and old versions double as time travel until
  * vacuumed. At 100 TB each merge rewrites only because this demo
  * state is unbucketed — production state bucketed on the key turns
  * the merge shuffle into a co-located one (see `sinks/Lake`).
  */
object CdcStream {

  private val stateCols = Seq("cust_id", "acctbal_cents", "segment",
    "seq_ts", "seq_event", "op")

  /** Raw event rows → versioned changelog rows (q72's mapping plus the
    * explicit seq columns): error events delete, everything else
    * upserts; seq = (microsecond ts, event_id) — [[EventsSource]] already
    * normalizes ts to the microsecond grid both engines share (q72/q91
    * rule), so seq_ts is just its epoch-micros value.
    */
  private def toChangelog(raw: DataFrame): DataFrame =
    raw.select(
      (col("user_id") + 1450).as("cust_id"),
      (col("value").cast("decimal(14,2)") * 100).cast("long")
        .as("acctbal_cents"),
      lit("EVENT").as("segment"),
      expr("unix_micros(ts)").as("seq_ts"),
      col("event_id").as("seq_event"),
      when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("upsert")).as("op"))

  /** Run the full loop over `sfDir`'s events feed (AvailableNow) seeded
    * with the customer snapshot; returns the final merged state minus
    * tombstones: (cust_id, acctbal_cents, segment). Equals the batch
    * [[Cdc.applyChangelog]] result by construction — q113 pins that
    * cross-paradigm equality against the q72 oracle.
    *
    * @param maxFilesPerTrigger chop the source into that many-file
    *        micro-batches (tests use 1 to force multi-batch merging);
    *        0 = everything in one batch
    */
  def mergedSnapshot(spark: SparkSession, sfDir: String,
      sourceGlob: String = "events.parquet",
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      "graft_cdcstream_" + graft.Tables.scratchKey(sfDir + sourceGlob))
      .toString
    org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)

    // v0: the seeded snapshot — seq below any real change, no tombstones
    graft.Tables.customer(spark, sfDir).select(
        col("c_custkey").as("cust_id"),
        (col("c_acctbal").cast("decimal(14,2)") * 100).cast("long")
          .as("acctbal_cents"),
        col("c_mktsegment").as("segment"),
        lit(Long.MinValue).as("seq_ts"),
        lit(Long.MinValue).as("seq_event"),
        lit("upsert").as("op"))
      .write.parquet(s"$root/v0")
    @volatile var cur = s"$root/v0"

    val q = toChangelog(EventsSource.stream(spark, sfDir, sourceGlob,
        maxFilesPerTrigger))
      .writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val state = spark.read.parquet(cur)
        val next = s"$root/v${id + 1}"
        Cdc.mergeVersioned(state, batch.select(stateCols.map(col): _*),
            "cust_id", Seq("seq_ts", "seq_event"), "op")
          .write.mode("overwrite").parquet(next)
        cur = next
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable()
    finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    spark.read.parquet(cur)
      .filter(col("op") =!= "delete")
      .select(col("cust_id"), col("acctbal_cents"), col("segment"))
  }
}
