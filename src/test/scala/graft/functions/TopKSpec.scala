package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopKPairs must equal the window row_number form on data built to
  * stress exactly what a heap gets wrong: heavy ord ties (forcing the
  * key tie-break), duplicate (ord, key) pairs, groups smaller than k,
  * and multi-partition input (forcing serialize/merge through the
  * partial-aggregation path).
  */
class TopKSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("key").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("long").as("rank"),
        col("ord"), col("key"))
  }

  private def heapTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopK.topKPairs(col("ord"), col("key"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).cast("long").as("rank"),
        col("col.ord").as("ord"), col("col.key").as("key"))

  test("equals the window form on tie-heavy multi-partition data") {
    // 40 groups × 500 rows; ord drawn from just 7 values so nearly every
    // boundary decision runs through the key tie-break; keys collide
    // across rows too (mod 97), producing duplicate (ord, key) pairs.
    val df = spark.range(20000).repartition(16).select(
      (col("id") % 40).as("g"),
      pmod(xxhash64(col("id"), lit(1L)), lit(7L)).as("ord"),
      pmod(xxhash64(col("id"), lit(2L)), lit(97L)).as("key"))
    val a = heapTopK(df, 5).collect().map(_.toSeq).toSet
    val b = windowTopK(df, 5).collect().map(_.toSeq).toSet
    assert(a == b, s"heap and window top-5 differ: ${a.diff(b)} vs ${b.diff(a)}")
    assert(a.size == 40 * 5)
  }

  test("groups smaller than k return their full sorted contents") {
    import spark.implicits._
    val df = Seq((1L, 10L, 3L), (1L, 10L, 1L), (2L, 7L, 9L))
      .toDF("g", "ord", "key").repartition(3)
    val got = heapTopK(df, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, 1L, 10L, 1L), (1L, 2L, 10L, 3L), (2L, 1L, 7L, 9L)),
      s"got $got")
  }

  test("null ord or key rows are skipped, not ranked") {
    import spark.implicits._
    val df = Seq((1L, Some(5L), Some(1L)), (1L, None, Some(2L)),
      (1L, Some(9L), None)).toDF("g", "ord", "key")
    val got = heapTopK(df, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((1L, 1L, 5L, 1L)), s"got $got")
  }

  test("sortableDoubleBits: order-preserving involution over the double line") {
    import graft.functions.ArrayOps.{sortableDoubleBits, bitsToDouble}
    val rnd = new scala.util.Random(7)
    val specials = Seq(0.0, -0.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, 1e-310, -1e-310, // denormals
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.0, -1.0, math.Pi, -math.Pi)
    val samples = specials ++
      Seq.fill(2000)(rnd.nextDouble() * math.pow(10, rnd.nextInt(600) - 300)
        * (if (rnd.nextBoolean()) 1 else -1))
    // order preservation: a < b ⟺ bits(a) < bits(b); a == b ⟹ equal bits
    for (a <- samples; b <- samples.take(50)) {
      val (sa, sb) = (sortableDoubleBits(a), sortableDoubleBits(b))
      if (a < b) assert(sa < sb, s"$a < $b but $sa >= $sb")
      else if (a > b) assert(sa > sb, s"$a > $b but $sa <= $sb")
      else assert(sa == sb, s"$a == $b but bits differ ($sa vs $sb)")
    }
    // involution: the exact double survives the round-trip (-0.0 is
    // normalized to +0.0 by contract — the one deliberate collapse)
    for (a <- samples) {
      val back = bitsToDouble(sortableDoubleBits(a))
      if (a == 0.0) assert(back == 0.0 &&
        java.lang.Double.doubleToLongBits(back) == 0L)
      else assert(back == a && !(back == a && a != a), s"$a -> $back")
    }
  }
}
