package graft.flatten

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EsJson

/** The two flatten implementations — expression path ([[Flattener.flatten]])
  * and direct row-walk ([[Flattener.flattenFast]]) — must be byte-identical
  * on every cell, on the golden document and on generated batches covering
  * every cell class (scalars, ragged arrays, primitive arrays, truncation,
  * special characters).
  */
class FlattenerEquivalenceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rowsOf(df: DataFrame): (Seq[String], Set[Seq[String]]) =
    (df.columns.toSeq,
      df.collect().map(_.toSeq.map(_.asInstanceOf[String]).toIndexedSeq: Seq[String])
        .toSet)

  private def assertSame(df: DataFrame, maxDepth: Int = 20): Unit = {
    val slow = rowsOf(Flattener.flatten(df, maxDepth))
    val fast = rowsOf(Flattener.flattenFast(df, maxDepth))
    assert(slow._1 == fast._1, "column lists differ")
    val onlySlow = slow._2 -- fast._2
    val onlyFast = fast._2 -- slow._2
    assert(onlySlow.isEmpty && onlyFast.isEmpty, {
      val s = onlySlow.headOption.getOrElse(Seq())
      val f = onlyFast.headOption.getOrElse(Seq())
      val diffs = slow._1.indices.filter(i =>
        s.lift(i) != f.lift(i)).take(5)
        .map(i => s"${slow._1(i)}: slow=${s.lift(i)} fast=${f.lift(i)}")
      s"row mismatch; first diffs: $diffs"
    })
  }

  test("golden document: fast path == expression path on all 5028 cells") {
    assertSame(EsJson.read(spark, "/root/reference/ElasticSearch_Document.json"))
  }

  test("generated batches: ragged arrays, specials, truncation") {
    import spark.implicits._
    val docs = Seq(
      """{"id":1,"h":[],"arr":["a","b"],"nums":[1.5,2.0],"deep":{"x":{"y":{"z":7}}},"t":true,"s":"quote\"in and\ttab"}""",
      """{"id":2,"h":[{"a":1,"m":[{"k":"v"}]},{"a":2}],"nums":[],"n":null}""",
      """{"id":3,"h":[{"a":3,"m":[{"k":"w"},{"k":"u"}]}],"s":"back\\slash end "}""")
    val df = spark.read.json(docs.toDS)
    assertSame(df)
    assertSame(df, maxDepth = 2)
  }
}
