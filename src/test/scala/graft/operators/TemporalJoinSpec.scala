package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("asOf picks the latest right row at-or-before, ties by payload") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10, t=100
      (2L, 10L, 50L),  // before every right row -> null
      (3L, 20L, 100L), // key 20 has no right rows -> null
      (4L, 10L, 60L)   // exactly at right t=60 -> "<=" includes it
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (901L, 10L, 60L),
      (902L, 10L, 60L), // same time as 901: larger id wins ties
      (903L, 10L, 90L),
      (904L, 10L, 101L) // after every left row
    ).toDF("rid", "k", "t")
      .select(col("t"), col("rid"), col("k"))
    val out = TemporalJoin.asOf(left, right, "k", "t", Seq("t", "rid"))
      .select(col("event_id"), col("asof.rid").as("rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) == 903L) // latest <= 100
    assert(out(2L) == -1L)  // nothing at-or-before 50
    assert(out(3L) == -1L)  // key never seen on the right
    assert(out(4L) == 902L) // tie at t=60 -> max payload struct
  }

  test("withinWindow: bin boundaries, inclusive upper, equal-ts excluded") {
    import spark.implicits._
    // window = 100. Pairs crossing a bin boundary (95 -> 105) must be
    // found; gap == 100 included; gap == 101 excluded; equal ts excluded.
    val df = Seq(
      (1L, 7L, 95L), (2L, 7L, 105L),   // cross-bin, gap 10
      (3L, 7L, 200L), (4L, 7L, 300L),  // gap exactly 100
      (5L, 7L, 500L), (6L, 7L, 601L),  // gap 101 -> excluded
      (7L, 7L, 700L), (8L, 7L, 700L),  // equal ts -> excluded
      (9L, 8L, 95L)                    // other key: never pairs
    ).toDF("event_id", "k", "t")
    val pairs = TemporalJoin.withinWindow(df, "k", "t", "event_id", 100L)
      .select(col("id_a"), col("id_b"), col("gap"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 10L), (2L, 3L, 95L), (3L, 4L, 100L),
      (6L, 7L, 99L), (6L, 8L, 99L)), pairs.toString)
  }

  test("withinWindow matches a naive range join on real events") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ms", expr("unix_micros(ts) div 1000"))
    val fast = TemporalJoin
      .withinWindow(ev, "user_id", "ms", "event_id", 3600000L)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ev.select(col("user_id"), col("event_id").as("id_a"),
      col("ms").as("ms_a"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"),
      col("ms").as("ms_b"))
    val naive = a.join(b, Seq("user_id"))
      .filter(col("ms_b") > col("ms_a") &&
        col("ms_b") - col("ms_a") <= 3600000L)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(naive.nonEmpty)
  }
}
