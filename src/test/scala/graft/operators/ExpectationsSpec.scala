package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Expectations gate: measured values, bound evaluation (one-sided and
  * two-sided), check-order preservation, duplicate-name guard, and the
  * referential-integrity row (orphans, null keys, tolerance).
  */
class ExpectationsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  import org.apache.spark.sql.functions._
  import Expectations.Check

  test("one aggregate pass: values, bounds, pass flags") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 300L))
      .toDF("id", "v")
    val rep = Expectations.report(df, Seq(
      Check("rows", count(lit(1)), lo = Some(1L)),
      Check("v_max", max(col("v")), hi = Some(100L)),          // FAILS: 300
      Check("id_nulls", count(when(col("id").isNull, 1)),
        lo = Some(0L), hi = Some(0L))))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(rep === Array(
      ("rows", 3L, Some(1L), None, true),
      ("v_max", 300L, None, Some(100L), false),
      ("id_nulls", 0L, Some(0L), Some(0L), true)))
  }

  test("duplicate check names are rejected") {
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Expectations.report(df, Seq(
        Check("x", count(lit(1)), lo = Some(0L)),
        Check("x", max(col("id")), lo = Some(0L))))
    }
    intercept[IllegalArgumentException](Check("nobounds", count(lit(1))))
  }

  test("referential integrity: orphans, null keys, tolerance") {
    val child = Seq((1L, Some(10L)), (2L, Some(11L)), (3L, Some(99L)),
      (4L, None)).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val strict = Expectations.refIntegrity("ri", child, "fk", parent, "pk")
      .collect()(0)
    // 99 is an orphan; the NULL fk counts as one too
    assert((strict.getString(0), strict.getLong(1), strict.getBoolean(4))
      === (("ri", 2L, false)))
    val tolerant = Expectations.refIntegrity("ri", child, "fk", parent,
      "pk", maxOrphans = 2L).collect()(0)
    assert(tolerant.getBoolean(4))
  }

  test("NULL measured values FAIL — the gate never passes vacuously") {
    // min/max over an empty table (or an all-NULL column) aggregate to
    // NULL; a NULL-tolerant pass would green-light exactly the
    // degenerate inputs the gate exists to catch
    val empty = Seq.empty[(Long, Long)].toDF("id", "v")
    val rep = Expectations.report(empty, Seq(
      Check("v_min", min(col("v")), lo = Some(0L)),
      Check("rows", count(lit(1)), lo = Some(1L))))
      .collect()
      .map(r => (r.getString(0), Option(r.get(1)), r.getBoolean(4)))
    assert(rep === Array(
      ("v_min", None, false),       // NULL value -> fail, not vacuous pass
      ("rows", Some(0L), false)))   // count is 0, not NULL -> bound fails
    val allNull = Seq((1L, Option.empty[Long]), (2L, None)).toDF("id", "v")
    val r2 = Expectations.report(allNull,
      Seq(Check("v_max", max(col("v")), hi = Some(10L)))).collect()(0)
    assert(r2.get(1) == null && !r2.getBoolean(4))
  }

  test("names that would break the generated stack() SQL are rejected") {
    val df = Seq(1L).toDF("id")
    for (bad <- Seq("p99's latency", "a`b", "x;drop")) {
      val e = intercept[IllegalArgumentException] {
        Expectations.report(df,
          Seq(Check(bad, count(lit(1)), lo = Some(0L))))
      }
      assert(e.getMessage.contains("check name"), bad)
    }
  }

  test("refIntegrity works when both sides key the same column name") {
    val child = Seq(1L, 2L, 9L).toDF("id")
    val parent = Seq(1L, 2L).toDF("id")
    val r = Expectations.refIntegrity("ri", child, "id", parent, "id")
      .collect()(0)
    assert((r.getLong(1), r.getBoolean(4)) === ((1L, false)))
  }

  test("report + refIntegrity union shares one schema") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val u = Expectations.report(df,
        Seq(Check("rows", count(lit(1)), lo = Some(1L))))
      .unionByName(Expectations.refIntegrity("ri", df, "a", df, "b"))
    assert(u.columns.toSeq ===
      Seq("check_name", "value", "lo", "hi", "pass"))
    assert(u.count() === 2L)
  }
}
