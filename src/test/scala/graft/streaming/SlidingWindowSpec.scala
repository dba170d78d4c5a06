package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sliding-window invariants the oracle's equality can't state directly:
  * the overlap factor (width/slide = 3) means every event is counted in
  * EXACTLY three windows — total windowed count = 3 × event count —
  * while the tumbling form counts each exactly once.
  */
class SlidingWindowSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every event lands in exactly width/slide sliding windows") {
    val nEvents = graft.Tables.events(spark, sf).count()
    val sliding = EventsStream.slidingAgg(spark, sf)
      .agg(sum(col("n"))).collect().head.getLong(0)
    val tumbling = EventsStream.windowedAgg(spark, sf)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(tumbling == nEvents, s"tumbling $tumbling != events $nEvents")
    assert(sliding == 3 * nEvents, s"sliding $sliding != 3*$nEvents")
  }
}
