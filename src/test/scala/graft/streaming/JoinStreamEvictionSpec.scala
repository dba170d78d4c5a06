package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Watermark EVICTION for the stream-stream join — the other half of the
  * bounded-state claim q76 cannot exercise (its 30-day watermark over a
  * replayed batch never fires).
  *
  * Two micro-batches under a 1-minute watermark:
  *  - batch 1: an attributable (view, purchase) pair at T0, plus a lone
  *    view two hours later that pushes the max event time (and therefore
  *    the next batch's watermark) to T0+2h;
  *  - batch 2: a purchase back at T0 — inside the join window of the
  *    batch-1 view, but far behind the watermark.
  *
  * The late purchase must produce NO pair (dropped at the state-store
  * input), and the join's state must shed the T0-era rows instead of
  * holding every event ever seen — the exact property that keeps state
  * bounded on an unbounded stream.
  */
class JoinStreamEvictionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // epoch NANOS, the driver table's physical encoding (sourceStream
  // converts via `ts div 1000` → timestamp_micros)
  private val T0 = 1577836800L * 1000000000L // 2020-01-01 00:00:00 UTC
  private def min(m: Long): Long = m * 60L * 1000000000L

  test("late purchase is dropped and T0-era state is evicted") {
    import spark.implicits._
    val dir = Files.createTempDirectory("vp_evict_src_").toFile.getAbsolutePath
    def writeBatch(n: Int, rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
        .withColumn("props", org.apache.spark.sql.functions.lit("{}"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/batch$n")

    // batch 1: pair at T0 (+5 min purchase), plus sentinel view AND
    // purchase at T0+120min (keyless — users 9/8 have no counterpart).
    // The global watermark is the MIN across both sides' event-time maxes
    // (multipleWatermarkPolicy=min), so BOTH sides need a T0+120min row
    // to advance the next batch's watermark to ~T0+119min.
    writeBatch(1, Seq(
      (1L, T0, 7L, "view"),
      (2L, T0 + min(5), 7L, "purchase"),
      (3L, T0 + min(120), 9L, "view"),
      (5L, T0 + min(120), 8L, "purchase")))

    val joined = JoinStream.viewPurchaseJoined(spark, s"$dir/batch*",
      windowMinutes = 30, watermarkDelay = "1 minute", glob = "*.parquet")
    val q = joined.writeStream
      .format("memory").queryName("vp_evict").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("vp_evict").as[(Long, Long, Long)].collect().toSet
      assert(afterB1 == Set((7L, 1L, 2L)), s"batch-1 pair missing: $afterB1")

      // batch 2: late purchase at T0+6min for the same user — inside the
      // batch-1 view's 30-min window, but the watermark is now ~T0+119min
      writeBatch(2, Seq((4L, T0 + min(6), 7L, "purchase")))
      q.processAllAvailable()

      val afterB2 = spark.table("vp_evict").as[(Long, Long, Long)].collect().toSet
      assert(afterB2 == Set((7L, 1L, 2L)),
        s"late purchase must not produce a pair: $afterB2")

      val progresses = q.recentProgress.toSeq
      val stateOps = progresses.flatMap(_.stateOperators)
      assert(stateOps.nonEmpty, "no stateOperators metrics reported")
      val dropped = stateOps.map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L,
        s"the late purchase should be dropped by the watermark (got $dropped)")
      // state after batch 2 must NOT hold all 5 input rows: the T0-era
      // view/purchase are behind the derived state watermarks and must be
      // evicted — only the two T0+120min sentinels may remain
      val lastRows = progresses.reverse
        .find(_.stateOperators.exists(_.numRowsTotal > 0L))
        .orElse(progresses.lastOption)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      assert(lastRows >= 0L && lastRows <= 2L,
        s"state must shed T0-era rows (rows=$lastRows, expected <= 2)")
    } finally q.stop()
  }
}
