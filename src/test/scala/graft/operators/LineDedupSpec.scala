package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Global line-level dedup (the C4 rule): each surviving distinct line
  * kept exactly once corpus-wide at its (id ASC, pos ASC) first
  * occurrence, boilerplate lines (doc_df > maxDocFreq) dropped from
  * every document INCLUDING the first, reassembly in original order,
  * and fully-boilerplate docs surfacing as empty rows rather than
  * disappearing.
  */
class LineDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val corpus = Seq(
    // B = boilerplate in 3 docs (df=3 > maxDf=2): dropped everywhere.
    // X is duplicated WITHIN doc 1 and ACROSS docs 1/2: one copy
    // survives, at doc 1 pos 1.
    (1L, "B\nX\nX\nA"),
    (2L, "X\nB\nC"),
    (3L, "B"),     // fully boilerplate -> empty, not dropped
    (4L, "D\nE")   // untouched doc keeps its order
  ).toDF("doc_id", "text")

  private def run(maxDf: Long) =
    Dedup.lineDedup(corpus, "doc_id", "text", "\n", maxDf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("first occurrence survives, within-doc and cross-doc copies drop, boilerplate drops everywhere") {
    assert(run(2L) === Map(
      1L -> (("X\nA", 4L, 2L)),
      2L -> (("C", 3L, 1L)),
      3L -> (("", 1L, 0L)),
      4L -> (("D\nE", 2L, 2L))))
  }

  test("no doc-frequency threshold: boilerplate's first occurrence is kept") {
    val got = run(Long.MaxValue)
    assert(got(1L) === (("B\nX\nA", 4L, 3L)), "doc 1 holds B's and X's first occurrences")
    assert(got(2L) === (("C", 3L, 1L)))
    assert(got(3L) === (("", 1L, 0L)), "doc 3's B already kept in doc 1")
  }

  test("result is invariant under adversarial partitioning") {
    val a = Dedup.lineDedup(corpus.repartition(1), "doc_id", "text", "\n", 2L)
      .collect().map(_.toSeq).toSet
    val b = Dedup.lineDedup(corpus.repartition(17), "doc_id", "text", "\n", 2L)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("custom separator with regex metacharacters is treated literally") {
    val df = Seq((1L, "a||b||a"), (2L, "b||c")).toDF("doc_id", "text")
    val got = Dedup.lineDedup(df, "doc_id", "text", "||", Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "a||b", 2L -> "c"))
  }
}
