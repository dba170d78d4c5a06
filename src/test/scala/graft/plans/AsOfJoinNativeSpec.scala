package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native AS-OF operator (custom LogicalPlan + Strategy + SparkPlan)
  * must be row-identical to its compose-existing-ops twin
  * (`TemporalJoin.asOf`, the union+window form) — on crafted edge cases
  * and on the real events table — and must actually plan through
  * `AsOfJoinExec`.
  */
class AsOfJoinNativeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("edge cases: no prior match, exact-time match, ties, key isolation") {
    import spark.implicits._
    val left = spark.sparkContext.parallelize(Seq(
      (1L, 5L, "l-a"),   // before any right row of key 1 -> null
      (1L, 10L, "l-b"),  // exact-time match (<=)
      (1L, 30L, "l-c"),  // picks latest of 10,20
      (2L, 99L, "l-d"),  // key 2 has no right rows at all
      (3L, 15L, "l-e")   // tie: two right rows at t=10 -> greater payload
    )).toDF("k", "t", "tag")
    val right = spark.sparkContext.parallelize(Seq(
      (1L, 10L, 100L), (1L, 20L, 200L),
      (3L, 10L, 301L), (3L, 10L, 305L)
    )).toDF("k", "t", "v")
    val out = AsOfJoinNative.asOf(left, right, "k", "t", Seq("v"))
      .collect()
      .map(r => (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    assert(out == Map("l-a" -> -1L, "l-b" -> 100L, "l-c" -> 200L,
      "l-d" -> -1L, "l-e" -> 305L), out.toString)
  }

  test("plans through AsOfJoinExec with co-partitioned sorted children") {
    import spark.implicits._
    val l = spark.sparkContext.parallelize(Seq((1L, 1L))).toDF("k", "t")
    val r = spark.sparkContext.parallelize(Seq((1L, 1L, 1L)))
      .toDF("k", "t", "v")
    val p = AsOfJoinNative.asOf(l, r, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native exec missing from plan:\n$p")
  }

  test("null key/time rows fail loudly instead of joining as key/epoch 0") {
    import spark.implicits._
    // getLong on a null InternalRow field silently reads 0 — before the
    // fetch-site guards, a null key row joined as key 0 and produced
    // silently wrong output; the v1 contract must be enforced at runtime.
    val right = Seq((0L, 5L, 900L), (1L, 10L, 100L)).toDF("k", "t", "v")
    val nullKeyLeft = spark.sql(
      "SELECT * FROM VALUES (CAST(NULL AS BIGINT), 20L, 'bad'), " +
        "(1L, 20L, 'ok') AS t(k, t, tag)")
    val e1 = intercept[Exception] {
      AsOfJoinNative.asOf(nullKeyLeft, right, "k", "t", Seq("v")).collect()
    }
    assert(e1.toString.contains("as-of v1 contract") ||
      Option(e1.getCause).exists(_.toString.contains("as-of v1 contract")),
      e1.toString)
    val nullTimeRight = spark.sql(
      "SELECT * FROM VALUES (1L, CAST(NULL AS BIGINT), 7L) AS t(k, t, v)")
    val left = Seq((1L, 20L, "ok")).toDF("k", "t", "tag")
    val e2 = intercept[Exception] {
      AsOfJoinNative.asOf(left, nullTimeRight, "k", "t", Seq("v")).collect()
    }
    assert(e2.toString.contains("as-of v1 contract") ||
      Option(e2.getCause).exists(_.toString.contains("as-of v1 contract")),
      e2.toString)
  }

  test("differential vs TemporalJoin.asOf on the real events table") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, sf)
      .withColumn("ms", expr("unix_micros(ts) div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms"),
        col("ms").as("click_ms"), col("event_id").as("click_id"))
    val native = AsOfJoinNative
      .asOf(purchases, clicks, "user_id", "ms", Seq("click_ms", "click_id"))
      .select(col("event_id"), col("click_ms"), col("click_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    val windowed = graft.operators.TemporalJoin
      .asOf(purchases,
        clicks.select(col("user_id"), col("ms"), col("click_ms"),
          col("click_id")),
        "user_id", "ms", Seq("click_ms", "click_id"))
      .select(col("event_id"), col("asof.click_ms"), col("asof.click_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(native.nonEmpty, "empty differential corpus")
    assert(native == windowed,
      s"native minus windowed: ${(native -- windowed).take(5)}; " +
        s"windowed minus native: ${(windowed -- native).take(5)}")
  }
}
