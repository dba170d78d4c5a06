package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Drift.distributionDrift]] and [[Sampling.quotaCappedBest]] — the
  * round-13 drift/mixing pair. Pinned: the cross-multiplied KS against
  * a hand-computed reference (no float division anywhere), one-sided
  * group rows, NULL exclusion, flag thresholds; quota application
  * semantics (per-domain best by (score DESC, id ASC), quota >
  * population, zero quota, absent domain, NULL domain).
  */
class DriftSelectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("distributionDrift: exact cross-multiplied KS, shifted group flags, identical group does not") {
    // group a: identical on both sides; group b: v2 shifted far right
    val v1 = (Seq.tabulate(10)(i => ("a", i.toLong)) ++
      Seq.tabulate(10)(i => ("b", i.toLong))).toDF("grp", "v")
    val v2 = (Seq.tabulate(10)(i => ("a", i.toLong)) ++
      Seq.tabulate(10)(i => ("b", i.toLong + 100L))).toDF("grp", "v")
    val got = Drift.distributionDrift(v1, v2, "v", "grp",
        gridSize = 4, thresholdPpm = 500000L) // KS > 0.5 flags
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val (nA1, nA2, ksA, fA) = got("a")
    assert((nA1, nA2) === ((10L, 10L)))
    assert(ksA === 0L && !fA, "identical distributions must not flag")
    val (_, _, ksB, fB) = got("b")
    // grid over union range [0, 109]: b's v1 mass is entirely below
    // every interior cut, v2's entirely above until the last — KS = 1
    // at some cut: |10*10 - 0*10| = 100
    assert(ksB === 100L && fB, s"shifted group: ks=$ksB flagged=$fB")
  }

  test("distributionDrift: flag survives populations whose ppm product overflows a long") {
    // fully disjoint sides, 3.2e6 rows each: ks_num reaches n1·n2 ≈
    // 1.02e13, and the flag's ks_num·10⁶ ≈ 1.02e19 > 2^63 — the
    // pre-decimal long comparison threw ANSI overflow here, ~1000×
    // below the scaladoc's n1·n2 < 2^63 domain. The statistic itself
    // is fine; only the flag arithmetic needed decimal(38,0).
    val n = 3200000L
    val a = spark.range(n).select(lit("g").as("grp"), (col("id") % 10).as("v"))
    val b = spark.range(n).select(lit("g").as("grp"),
      (col("id") % 10 + 100L).as("v"))
    val row = Drift.distributionDrift(a, b, "v", "grp").collect()(0)
    assert(row.getLong(3) === n * n, "disjoint sides: KS = 1 → ks_num = n1·n2")
    assert(row.getBoolean(4), "full shift must flag")
  }

  test("distributionDrift: one-sided and NULL groups") {
    val v1 = Seq(("only_old", 1L), ("both", 2L),
      (null.asInstanceOf[String], 9L)).toDF("grp", "v")
    val v2 = Seq(("only_new", 3L), ("both", 2L)).toDF("grp", "v")
    val got = Drift.distributionDrift(v1, v2, "v", "grp",
        gridSize = 2, thresholdPpm = 100000L)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getBoolean(4))).toMap
    assert(got.keySet === Set("only_old", "only_new", "both"))
    assert(got("only_old")._2.isEmpty && got("only_old")._4,
      "disappearing group must be NULL-sided and flagged")
    assert(got("only_new")._1.isEmpty && got("only_new")._4,
      "appearing group must be NULL-sided and flagged")
    assert(got("both")._3 === Some(0L) && !got("both")._4)
  }

  test("quotaCappedBest: per-domain (score DESC, id ASC), quota semantics") {
    val docs = Seq(
      ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 30L), ("a", 4L, 20L),
      ("b", 5L, 5L), ("b", 6L, 6L),
      ("c", 7L, 1L),                      // quota 0 -> dropped
      ("d", 8L, 9L),                      // absent from quotas -> dropped
      (null.asInstanceOf[String], 9L, 99L) // NULL domain -> dropped
    ).toDF("dom", "id", "score")
    val quotas = Seq(("a", 2L), ("b", 5L), ("c", 0L))
      .toDF("dom", "quota")
    val got = Sampling.quotaCappedBest(docs, "dom", "id", "score", quotas)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2))
    // a: top-2 by (score desc, id asc) = id 2 (30), id 3 (30 tie, larger
    // id loses to 2 but beats 4's 20) -> ranks 1,2 = ids 2,3
    // b: quota 5 > population 2 -> whole domain, best-first
    assert(got === Seq(
      ("a", 1L, 2L, 30L), ("a", 2L, 3L, 30L),
      ("b", 1L, 6L, 6L), ("b", 2L, 5L, 5L)))
  }
}
