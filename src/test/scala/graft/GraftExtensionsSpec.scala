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
}
