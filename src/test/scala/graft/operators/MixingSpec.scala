package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fractional-epoch resampling: exact copy counts per weight class,
  * determinism across partitionings, the sequence(1,0) phantom-copy
  * guard, fraction accuracy at scale, and input-order invariance.
  */
class MixingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def docs(n: Int, domains: Seq[String]) =
    (0 until n).map(i => (i.toLong, domains(i % domains.size)))
      .toDF("id", "dom")

  test("integer epochs: every doc exactly floor(e) copies; 0 drops all") {
    val df = docs(60, Seq("a", "b", "z"))
    val out = Mixing.epochMix(df, "id", "dom",
      Map("a" -> 2000L, "b" -> 1000L, "z" -> 0L), seed = 7L)
    val byDom = out.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(byDom === Map("a" -> 40L, "b" -> 20L)) // no z rows at all
    // copy indices are dense 1..n_copies
    assert(out.filter(col("dom") === "a")
      .groupBy("id").agg(sort_array(collect_list("copy")).as("c"))
      .select("c").as[Seq[Long]].collect()
      .forall(_ == Seq(1L, 2L)))
  }

  test("fractional epochs: hash-selected subset, deterministic, unbiased") {
    val df = docs(4000, Seq("a"))
    val out = Mixing.epochMix(df, "id", "dom",
      Map("a" -> 1300L), seed = 42L)
    val n = out.count()
    // every doc 1 or 2 copies; extra-copy fraction ~0.30 of 4000
    val extra = n - 4000L
    assert(extra > 1000 && extra < 1400, s"extra=$extra")
    // rerun identical; shuffled input identical (hash depends on id only)
    val again = Mixing.epochMix(df.repartition(13).orderBy(rand(1)),
      "id", "dom", Map("a" -> 1300L), seed = 42L)
    assert(again.select("id", "copy").except(out.select("id", "copy"))
      .count() === 0L)
    assert(out.select("id", "copy").except(again.select("id", "copy"))
      .count() === 0L)
    // a different seed selects a different subset
    val other = Mixing.epochMix(df, "id", "dom",
      Map("a" -> 1300L), seed = 43L)
    assert(other.select("id", "copy").except(out.select("id", "copy"))
      .count() > 0L)
  }

  test("sub-epoch down-sampling keeps only the hash fraction") {
    val df = docs(4000, Seq("a"))
    val out = Mixing.epochMix(df, "id", "dom",
      Map("a" -> 250L), seed = 5L)
    val n = out.count()
    assert(n > 800 && n < 1200, s"n=$n") // ~25% of 4000
    assert(out.select(max("n_copies")).as[Long].head() === 1L)
  }

  test("reserved output/scratch columns on the input are rejected") {
    // n_copies/copy are outputs and epochs_milli is join scratch —
    // silently overwriting a caller's same-named column would hand
    // downstream consumers mixer state as their data
    for (reserved <- Seq("n_copies", "copy", "epochs_milli")) {
      val df = docs(4, Seq("a")).withColumn(reserved, lit(9L))
      val e = intercept[IllegalArgumentException] {
        Mixing.epochMix(df, "id", "dom", Map("a" -> 1000L), seed = 1L)
      }
      assert(e.getMessage.contains(reserved))
    }
  }

  test("domains absent from the mix are dropped, not passed through") {
    val df = docs(20, Seq("a", "ghost"))
    val out = Mixing.epochMix(df, "id", "dom",
      Map("a" -> 1000L), seed = 1L)
    assert(out.select("dom").distinct().as[String].collect() === Array("a"))
  }

  test("temperatureShares: sqrt smoothing lifts small domains, quotas sum <= budget") {
    // 9:1 corpus — raw shares 900k/100k ppm; sqrt shares 750k/250k
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1 to 100).map(i => (1000L + i, "small"))).toDF("id", "dom")
    val out = Mixing.temperatureShares(df, "dom", budget = 1000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nBig, wBig, sBig, qBig) = out("big")
    val (nSmall, wSmall, sSmall, qSmall) = out("small")
    assert(nBig === 900L && nSmall === 100L)
    assert(wBig === 30000000L && wSmall === 10000000L) // sqrt*1e6 exact
    assert(sBig === 750000L && sSmall === 250000L)
    assert(qBig === 750L && qSmall === 250L)
    assert(qBig + qSmall <= 1000L)
    // sqrt smoothing strictly between uniform and proportional
    assert(sSmall > 100000L && sSmall < 500000L)
  }

  test("temperatureShares: quota arithmetic survives budgets whose long product overflows") {
    // w_micro = sqrt(100)·1e6 = 1e7; 1e7 × (2^62) ≈ 4.6e25 ≫ 2^63 —
    // the pre-decimal long product threw ANSI overflow here, despite the
    // scaladoc's claimed safety. decimal(38,0) carries it; the quota
    // itself (≤ budget) still fits a long.
    val df = (1 to 100).map(i => (i.toLong, "only")).toDF("id", "dom")
    val budget = Long.MaxValue / 2
    val r = Mixing.temperatureShares(df, "dom", budget).collect()(0)
    assert(r.getLong(3) === 1000000L)
    assert(r.getLong(4) === budget, "single domain takes the whole budget")
  }

  test("temperatureShares: NULL domain is a reported group; single domain takes all") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]))
      .toDF("id", "dom")
    val rows = Mixing.temperatureShares(df, "dom", budget = 100L).collect()
    assert(rows.length === 2, "NULL domain must be reported, not dropped")
    val one = Mixing.temperatureShares(
      Seq((1L, "x"), (2L, "x")).toDF("id", "dom"), "dom", budget = 100L)
      .collect()(0)
    assert(one.getLong(3) === 1000000L && one.getLong(4) === 100L)
  }
}
