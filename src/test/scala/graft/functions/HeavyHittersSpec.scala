package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries guarantee tests: every item with true frequency > n/k
  * survives the distributed sketch (across partition merges), and stored
  * counts underestimate by at most n/k.
  */
class HeavyHittersSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("true heavy hitters always survive; counts within the n/k bound") {
    import spark.implicits._
    // skewed synthetic stream: zipf-ish counts over 200 items, shuffled
    // deterministically and spread over 8 partitions so merges matter
    val items = (0 until 200).flatMap { i =>
      Seq.fill(if (i < 3) 400 else if (i < 20) 40 else 5)(s"item_$i")
    }
    val shuffled = new scala.util.Random(7L).shuffle(items)
    val n = shuffled.length.toLong
    val k = 16
    val df = shuffled.toDF("token").repartition(8)
    val sketch = df
      .agg(HeavyHitters.misraGries(k)(col("token")).as("mg"))
      .select(explode(col("mg")).as(Seq("token", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = items.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    assert(sketch.size <= k - 1, s"sketch kept ${sketch.size} >= k counters")
    // guarantee 1: every item with freq > n/k is in the sketch
    exact.filter(_._2 * k > n).foreach { case (t, c) =>
      assert(sketch.contains(t), s"heavy hitter $t (freq $c, n/k=${n / k}) dropped")
    }
    // guarantee 2: estimates never exceed the true count and undershoot
    // by at most n/k
    sketch.foreach { case (t, est) =>
      val c = exact(t)
      assert(est <= c, s"$t overestimated: $est > $c")
      assert(c - est <= n / k, s"$t undershoots by ${c - est} > n/k ${n / k}")
    }
  }

  test("single-partition sketch is exact when distinct items fit") {
    import spark.implicits._
    val df = Seq.fill(10)("a").++(Seq.fill(3)("b")).toDF("token")
      .coalesce(1)
    val got = df.agg(HeavyHitters.misraGries(8)(col("token")).as("mg"))
      .select(explode(col("mg")).as(Seq("token", "est")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 10L, "b" -> 3L))
  }
}
