package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exact discrete quantiles: hand-computed positions including the
  * ceil boundary and tie handling, and agreement with a brute-force
  * sorted-multiset reference on a larger grouped input.
  */
class QuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hand-computed quantiles with ties and ceil positions") {
    import spark.implicits._
    // group a: multiset {1, 2, 2, 5}: n=4
    //   q=500‰ → pos ceil(2.0)=2 → 2;  q=750‰ → pos 3 → 2
    //   q=751‰ → pos ceil(3.004)=4 → 5;  q=1000‰ → 5;  q=1‰ → pos 1 → 1
    val df = Seq(("a", 5L), ("a", 2L), ("a", 1L), ("a", 2L), ("b", 7L))
      .toDF("g", "x")
    val out = Quantiles.exactDiscrete(df, Seq("g"), "x",
        Seq(1, 500, 750, 751, 1000))
      .collect().map(r => ((r.getString(0), r.getLong(1).toInt), r.getLong(2)))
      .toMap
    assert(out(("a", 1)) === 1L)
    assert(out(("a", 500)) === 2L)
    assert(out(("a", 750)) === 2L)
    assert(out(("a", 751)) === 5L)
    assert(out(("a", 1000)) === 5L)
    assert(out(("b", 500)) === 7L) // singleton group: all quantiles = 7
  }

  test("NULL values are ignored, percentile_disc-style") {
    import spark.implicits._
    // NULLs must not count toward n or sort below every value: with the
    // two nulls counted, n=5 and the 1‰ quantile would be NULL; ignored
    // (percentile_disc), group a is the multiset {1, 2, 5} — n=3
    val df = Seq(("a", Some(5L)), ("a", None), ("a", Some(2L)),
        ("a", None), ("a", Some(1L)))
      .toDF("g", "x")
    val out = Quantiles.exactDiscrete(df, Seq("g"), "x", Seq(1, 500, 1000))
      .collect().map(r => ((r.getString(0), r.getLong(1).toInt), r.getLong(2)))
      .toMap
    assert(out(("a", 1)) === 1L)
    assert(out(("a", 500)) === 2L)
    assert(out(("a", 1000)) === 5L)
  }

  test("all-NULL group survives with a NULL quantile (percentile_disc)") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(9L)), ("b", None), ("b", None))
      .toDF("g", "x")
    val got = Quantiles.exactDiscrete(df, Seq("g"), "x", Seq(500))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // 'b' has only NULLs: percentile_disc returns the group with NULL,
    // it does not drop it; NULLs never count toward n for 'a'
    assert(got === Map("a" -> Some(1L), "b" -> None))
  }

  test("NULL group KEY is a regular group (null-safe re-seed join)") {
    import spark.implicits._
    // percentile_disc ignores NULL VALUES but a NULL group KEY is just
    // another group: it must return its computed quantile, not NULL.
    val df = Seq((Option("a"), Some(4L)), (Option.empty[String], Some(2L)),
        (Option.empty[String], Some(8L)), (Option.empty[String], None))
      .toDF("g", "x")
    val got = Quantiles.exactDiscrete(df, Seq("g"), "x", Seq(500, 1000))
      .collect().map(r => ((Option(r.getString(0)), r.getLong(1).toInt),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got((Some("a"), 500)) === Some(4L))
    // NULL-keyed group: multiset {2, 8}, median = 2, max = 8
    assert(got((None, 500)) === Some(2L))
    assert(got((None, 1000)) === Some(8L))
  }

  test("agrees with the sorted-multiset definition on grouped data") {
    import spark.implicits._
    val rows = for (g <- 0 until 3; i <- 1 to 101)
      yield (s"g$g", ((i * 7919 + g) % 50).toLong)
    val df = rows.toDF("g", "x")
    val qs = Seq(100, 250, 500, 900, 990)
    val got = Quantiles.exactDiscrete(df, Seq("g"), "x", qs)
      .collect().map(r => ((r.getString(0), r.getLong(1).toInt), r.getLong(2)))
      .toMap
    for (g <- 0 until 3) {
      val sorted = rows.filter(_._1 == s"g$g").map(_._2).sorted
      for (q <- qs) {
        val pos = math.ceil(q * sorted.length / 1000.0).toInt.max(1)
        assert(got((s"g$g", q)) === sorted(pos - 1),
          s"g$g q=$q pos=$pos")
      }
    }
  }
}
