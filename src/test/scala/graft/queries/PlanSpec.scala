package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Physical-plan regression tests — the properties that decide whether the
  * engine survives a 100×/1000× scale-up: filters and column pruning reach
  * the parquet scan, small dimensions broadcast (no fact-side shuffle),
  * top-k plans as TakeOrderedAndProject (no global sort materialization),
  * aggregates are partial (map-side combine) before the exchange.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)

  test("q02: predicates and projection are pushed into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("l_discount"), "discount filter not pushed")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate not pushed")
    // pruned read schema: no unused lineitem columns fetched
    assert(!p.contains("l_returnflag"), "read schema not pruned")
  }

  test("q03/q04/q13: dimension joins broadcast (no fact-side shuffle)") {
    Seq("q03_join_topk", "q04_star_join", "q13_case_agg").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"), s"$q lacks broadcast join")
    }
  }

  test("q09: global top-k plans as TakeOrderedAndProject") {
    assert(plan("q09_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial before the exchange") {
    val p = plan("q01_agg_fullscan")
    val firstAgg = p.indexOf("HashAggregate")
    val lastAgg = p.lastIndexOf("HashAggregate")
    assert(firstAgg >= 0 && lastAgg > firstAgg,
      "expected partial+final HashAggregate pair")
  }

  test("q05/q06: semi/anti joins stay semi/anti in the physical plan") {
    assert(plan("q05_semi_join").contains("LeftSemi"))
    assert(plan("q06_anti_join").contains("LeftAnti"))
  }
}
