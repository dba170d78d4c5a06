package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom semi-join reduction invariants: exact equality with the plain
  * inner join even when the filter is deliberately saturated with false
  * positives, a measured reduction on a selective build side, and the
  * no-false-negatives law under duplicate keys and nulls.
  */
class BloomJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dfs() = {
    import spark.implicits._
    // probe: 10k rows, keys 0..999 (10 rows/key); build: 20 keys
    val probe = (0L until 10000L).map(i => (i % 1000L, s"p$i"))
      .toDF("pk", "payload")
    val build = (0L until 1000L by 50L).map(k => (k, s"b$k"))
      .toDF("bk", "tag")
    (probe, build)
  }

  test("equals the plain inner join, rows and multiplicity") {
    val (probe, build) = dfs()
    val got = JoinReduction
      .bloomReducedJoin(probe, "pk", build, "bk")
      .select("pk", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(identity).toSeq
    val want = probe.join(build, col("pk") === col("bk"))
      .select("pk", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(identity).toSeq
    assert(got == want && got.size == 200) // 20 keys × 10 rows
  }

  test("a saturated filter (tiny mBits, all FPs) still yields the exact join") {
    val (probe, build) = dfs()
    // 64 bits for 20 keys × 5 hashes → nearly every probe row is a
    // false positive: the reduction does nothing, the join result must
    // still be exact — correctness never depends on the FP rate
    val got = JoinReduction
      .bloomReducedJoin(probe, "pk", build, "bk", mBits = 64, k = 5)
      .count()
    assert(got == 200)
  }

  test("measured reduction: survivors ≈ matching rows, zero false negatives") {
    val (probe, build) = dfs()
    val (total, survived, matching) =
      JoinReduction.reductionStats(probe, "pk", build, "bk")
    assert(total == 10000 && matching == 200)
    // no false negatives: every matching row survives the pre-filter
    assert(survived >= matching)
    // and the 64 Kbit default keeps FPs < 2% of the probe side
    assert(survived - matching < 200, s"survived=$survived")
  }

  test("null probe keys are dropped like the inner join drops them") {
    import spark.implicits._
    val probe = Seq((Some(1L), "a"), (None, "n"), (Some(2L), "b"))
      .toDF("pk", "payload")
    val build = Seq((1L, "t1"), (2L, "t2")).toDF("bk", "tag")
    val got = JoinReduction.bloomReducedJoin(probe, "pk", build, "bk")
    assert(got.count() == 2)
    assert(got.filter(col("payload") === "n").count() == 0)
  }
}
