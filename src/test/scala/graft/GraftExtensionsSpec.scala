package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Morton
import graft.operators.Layout

/** The SparkSessionExtensions tier: functions registered through the
  * user-facing `spark.sql.extensions` config must resolve from SQL text,
  * agree with their Column-API forms, and the native MortonCode codegen
  * must equal the compositional shift/mask sum everywhere.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // a NEW SparkSession (shared context, cleared default) so the
  // extensions config is actually applied at session construction
  private lazy val spark: SparkSession = {
    val base = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf read from the SparkContext at
    // first-session construction; the test JVM's context already exists,
    // so register through the equivalent public builder API instead
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    assert(s ne base, "expected a fresh session carrying the extensions")
    s
  }

  test("morton_code resolves from SQL and matches the Column API") {
    val r = spark.sql(
      "SELECT morton_code(3L, 5L), morton_code(3L, 5L, 16)").head()
    assert(r.getLong(0) == 39L && r.getLong(1) == 39L, r.toString)
  }

  test("simhash64 and jaccard_sorted resolve from SQL and match kernels") {
    val r = spark.sql(
      """SELECT simhash64(array('a', 'b', 'c')),
                jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L))""")
      .head()
    val viaColumn = spark.range(1)
      .select(graft.functions.SimHash.simhash(
        typedLit(Seq("a", "b", "c")))).head().getLong(0)
    assert(r.getLong(0) == viaColumn, "SQL simhash != Column simhash")
    assert(r.getDouble(1) == 0.5, s"jaccard ${r.getDouble(1)} != 0.5")
  }

  test("levenshtein prefilter rule: guard injected, results unchanged, idempotent") {
    import spark.implicits._
    // RDD-backed (LogicalRDD): a LocalRelation would be constant-folded
    // by ConvertToLocalRelation before the plan could show the guard
    val df = spark.sparkContext.parallelize(Seq(
        ("ab", "abc"), ("kitten", "sitting"), ("a", "zzzzzzzzzz"),
        ("same", "same"), (null, "x")))
      .toDF("a", "b")
    val q = df.filter(expr("levenshtein(a, b) <= 3"))
    val optimized = q.queryExecution.optimizedPlan
    // the O(1) length guard is a conjunct of the optimized filter
    assert(optimized.toString.contains("abs((length(a") ||
      optimized.toString.toLowerCase.contains("abs((length("),
      s"no length guard in:\n$optimized")
    // semantics: identical rows with the rule on (extensions session) and
    // off (base builder session has no extensions)
    val expect = Set(("ab", "abc"), ("kitten", "sitting"), ("same", "same"))
    val got = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expect, got.toString)
    // idempotent: re-applying the rule to the optimized plan is a no-op
    val again = graft.plans.LevenshteinPrefilter(optimized)
    assert(again.fastEquals(optimized), s"rule not idempotent:\n$again")
  }

  test("levenshtein prefilter leaves >, >= and 3-arg threshold forms alone") {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(Seq(("ab", "zzzz")))
      .toDF("a", "b")
    Seq("levenshtein(a, b) > 2", "levenshtein(a, b) >= 2",
      "levenshtein(a, b, 5) <= 3").foreach { pred =>
      val p = df.filter(expr(pred)).queryExecution.optimizedPlan
      assert(!p.toString.toLowerCase.contains("abs((length("),
        s"guard wrongly injected for `$pred`:\n$p")
    }
    // the unguardable > form still returns correct rows
    assert(df.filter(expr("levenshtein(a, b) > 2")).count() == 1L)
  }

  test("native MortonCode == compositional z sum on a random grid") {
    import spark.implicits._
    val df = spark.range(2000).select(
      (rand(7) * 65536).cast("long").as("x"),
      (rand(11) * 65536).cast("long").as("y"))
    val mismatches = df.select(
        Morton.code(col("x"), col("y"), 16).as("native"),
        Layout.zValueComposed(col("x"), col("y"), 16).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(mismatches == 0L, s"$mismatches mismatching z values")
    // interpreted path agrees with codegen path
    assert(Morton.interleave(3L, 5L, 16) == 39L)
    assert(Morton.interleave(0xFFFFL, 0L, 16) == 0x55555555L)
  }

  test("MortonNCode (k=3): codegen == interpreted kernel, 2-dim codeN " +
      "delegates to the magic-mask kernel, NULL propagates") {
    import spark.implicits._
    val df = spark.range(2000).select(
      (rand(7) * 2097152).cast("long").as("x"),
      (rand(11) * 2097152).cast("long").as("y"),
      (rand(13) * 2097152).cast("long").as("z"))
    val rows = df.select(col("x"), col("y"), col("z"),
      Morton.codeN(Seq(col("x"), col("y"), col("z")), 21).as("m"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(3) === Morton.interleaveN(
        Array(r.getLong(0), r.getLong(1), r.getLong(2)), 21))
    }
    // the 3-dim interleave is order-preserving per axis at fixed others
    assert(Morton.interleaveN(Array(1L, 0L, 0L), 4) === 1L)
    assert(Morton.interleaveN(Array(0L, 1L, 0L), 4) === 2L)
    assert(Morton.interleaveN(Array(0L, 0L, 1L), 4) === 4L)
    assert(Morton.interleaveN(Array(1L, 1L, 1L), 4) === 7L)
    // 2-dim codeN routes to the magic-mask MortonCode
    val two = df.select(
      Morton.codeN(Seq(col("x"), col("y")), 16).as("a"),
      Morton.code(col("x"), col("y"), 16).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(two === 0L)
    // NULL in any dimension → NULL out
    val n = Seq((Some(1L), Option.empty[Long], Some(2L)))
      .toDF("x", "y", "z")
      .select(Morton.codeN(Seq(col("x"), col("y"), col("z")), 8).as("m"))
      .collect()(0)
    assert(n.isNullAt(0))
  }
}
