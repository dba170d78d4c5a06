package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Policy-driven exact dedup ([[Dedup.keepBest]]): within each
  * exact-content group the kept copy is the argmax under the caller's
  * preference columns (descending), ids ascending on full ties — pinned
  * here because the implementation rides a single max(struct(...))
  * aggregate whose negated-id trick is easy to get wrong in either
  * direction.
  */
class DedupPolicySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("keeps the highest-preference copy; ties break to the smallest id") {
    val df = Seq(
      // group "dup": id 3 has the best score and must win over smaller ids
      (1L, "dup", 0.5), (2L, "dup", 0.9), (3L, "dup", 1.5),
      // group "tie": equal scores -> smallest id 10 wins
      (10L, "tie", 2.0), (11L, "tie", 2.0), (12L, "tie", 2.0),
      // singleton keeps itself
      (20L, "solo", 0.0)
    ).toDF("doc_id", "text", "score")
    val got = Dedup.keepBest(df, "doc_id", "text", Seq(col("score")))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got === Seq((3L, 3L), (10L, 3L), (20L, 1L)))
  }

  test("multiple preference columns rank lexicographically") {
    val df = Seq(
      // vintage ties at 1 between ids 2 and 3 -> second column (score)
      // decides: id 3 wins despite id 2's smaller id
      (1L, "d", 0L, 9.0), (2L, "d", 1L, 0.1), (3L, "d", 1L, 0.7)
    ).toDF("doc_id", "text", "vintage", "score")
    val got = Dedup.keepBest(df, "doc_id", "text",
        Seq(col("vintage"), col("score")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got === Array((3L, 3L)))
  }

  test("agrees with Dedup.exact group structure; empty policy is rejected") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val best = Dedup.keepBest(df, "doc_id", "text", Seq(lit(0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Dedup.exact(df, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // a constant policy degenerates to exact()'s min-id rule
    assert(best === exact)
    intercept[IllegalArgumentException] {
      Dedup.keepBest(df, "doc_id", "text", Seq.empty)
    }
  }

  test("a non-numeric id column is rejected loudly, not silently nulled") {
    val df = Seq(("x1", "a", 1.0), ("x2", "a", 2.0)).toDF("doc_id", "text", "score")
    val e = intercept[IllegalArgumentException] {
      Dedup.keepBest(df, "doc_id", "text", Seq(col("score")))
    }
    assert(e.getMessage.contains("numeric id"))
  }

  test("duplicationProfile: exact per-size masses including the unduplicated line") {
    // 4 singles, 2 pairs, 1 triple -> sizes 1/2/3
    val df = (Seq.tabulate(4)(i => (i.toLong, s"solo$i")) ++
      Seq((10L, "pairA"), (11L, "pairA"), (12L, "pairB"), (13L, "pairB"),
        (20L, "tri"), (21L, "tri"), (22L, "tri")))
      .toDF("doc_id", "text")
    val got = Dedup.duplicationProfile(df, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      1L -> ((4L, 4L, 0L)),
      2L -> ((2L, 4L, 2L)),
      3L -> ((1L, 3L, 2L))))
  }
}
