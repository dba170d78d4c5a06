package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Leakage-safe grouped splitting: group atomicity (the property the
  * operator exists for), fraction accuracy over many groups, exact
  * oracle replayability of the thresholds, determinism, and the
  * guard rails.
  */
class SplitSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val fracs = Seq("train" -> 800L, "valid" -> 100L, "test" -> 100L)

  // 2,000 groups × 1–5 rows each, deterministic sizes
  private lazy val manyGroups = {
    val rows = (0 until 2000).flatMap { g =>
      (0 to g % 5).map(i => (g.toLong * 10 + i, s"host$g.example"))
    }
    rows.toDF("doc_id", "grp")
  }

  test("assignment is group-atomic: one split per group, always") {
    val out = Split.grouped(manyGroups, "grp", 7L, fracs)
    val perGroup = out.groupBy("grp")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1)
    assert(perGroup.count() === 0L)
  }

  test("fractions land near the milli targets over many groups") {
    val out = Split.grouped(manyGroups.select("grp").distinct(), "grp",
      7L, fracs)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    // md5 is uniform; at n=2000 a ±3σ band for p=0.8 is ±2.7% —
    // assert a loose ±5% so the test never flakes while still catching
    // an off-by-a-split threshold bug (which shifts a band by 10%)
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05, counts)
    assert(math.abs(counts("valid") / 2000.0 - 0.1) < 0.05, counts)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.05, counts)
  }

  test("thresholds replay as the documented hex literals") {
    assert(Split.hexThreshold(800L) === "cccccc")
    assert(Split.hexThreshold(900L) === "e66666")
    assert(Split.hexThreshold(0L) === "000000")
    // 1000 milli = the full 16^6 space — a 7-char literal that would
    // compare WRONG against a 6-char draw, so the helper refuses
    intercept[IllegalArgumentException](Split.hexThreshold(1000L))
    // and the assignment really is the two string compares: replay it
    val out = Split.grouped(manyGroups, "grp", 7L, fracs)
      .withColumn("replayed",
        when(Split.draw(col("grp"), 7L) < lit("cccccc"), "train")
          .when(Split.draw(col("grp"), 7L) < lit("e66666"), "valid")
          .otherwise("test"))
    assert(out.filter(col("split") =!= col("replayed")).count() === 0L)
  }

  test("deterministic across reruns and partitionings; seed moves it") {
    val a = Split.grouped(manyGroups, "grp", 7L, fracs)
      .select("doc_id", "split").collect().map(r => (r.getLong(0),
        r.getString(1))).toMap
    val b = Split.grouped(manyGroups.repartition(13), "grp", 7L, fracs)
      .select("doc_id", "split").collect().map(r => (r.getLong(0),
        r.getString(1))).toMap
    assert(a === b)
    val c = Split.grouped(manyGroups, "grp", 8L, fracs)
      .select("doc_id", "split").collect().map(r => (r.getLong(0),
        r.getString(1))).toMap
    assert(a !== c, "a different seed must move some group")
  }

  test("NULL groups travel together into one split") {
    val df = Seq((1L, Option("a")), (2L, None), (3L, None))
      .toDF("doc_id", "grp")
    val out = Split.grouped(df, "grp", 7L, fracs)
    val nullSplits = out.filter(col("grp").isNull)
      .select("split").distinct().collect()
    assert(nullSplits.length === 1)
  }

  test("guard rails: bad fractions and a pre-existing split column") {
    val df = manyGroups
    intercept[IllegalArgumentException](
      Split.grouped(df, "grp", 7L, Seq("a" -> 500L, "b" -> 400L)))
    intercept[IllegalArgumentException](
      Split.grouped(df, "grp", 7L, Seq("a" -> 1000L, "a" -> 0L)))
    intercept[IllegalArgumentException](
      Split.grouped(df, "grp", 7L, Seq.empty))
    intercept[IllegalArgumentException](
      Split.grouped(df.withColumn("split", lit("x")), "grp", 7L, fracs))
  }
}
