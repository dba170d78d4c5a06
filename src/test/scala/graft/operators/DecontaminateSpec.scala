package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-gram decontamination: hand-built corpus with a planted leak,
  * distinct-gram hit counting, the zero-hit rows in the flag output,
  * the short-doc edge, and removal = flag-complement.
  */
class DecontaminateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("flags exactly the docs sharing an n-gram, counts distinct hits") {
    val corpus = Seq(
      (1L, "a b c d e"),     // contains bench 3-grams "a b c","b c d","c d e"
      (2L, "x y z w q"),     // clean
      (3L, "q a b c q q"),   // one hit: "a b c"
      (4L, "a b"),           // shorter than n — never contaminated
      (5L, "a b c a b c a b c") // distinct hits: "a b c" (+ none others in bench)
    ).toDF("doc_id", "text")
    val bench = Seq("a b c d e f").toDF("text") // grams incl "a b c".."d e f"
    val got = Decontaminate
      .flagContaminated(corpus, "doc_id", "text", bench, "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got === Map(
      1L -> ((3L, true)),  // "a b c","b c d","c d e" all in bench
      2L -> ((0L, false)),
      3L -> ((1L, true)),
      4L -> ((0L, false)),
      5L -> ((1L, true))   // distinct grams of doc 5 hitting bench: "a b c"
    ))
  }

  test("removal keeps exactly the clean docs") {
    val corpus = Seq(
      (1L, "a b c d e"), (2L, "x y z w q"), (3L, "n o p")
    ).toDF("doc_id", "text")
    val bench = Seq("a b c").toDF("text")
    val kept = Decontaminate
      .removeContaminated(corpus, "doc_id", "text", bench, "text", n = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(2L, 3L))
  }

  test("self-decontamination flags every doc with >= n tokens") {
    val corpus = Seq((1L, "a b c d"), (2L, "e f"), (3L, "g h i"))
      .toDF("doc_id", "text")
    val got = Decontaminate
      .flagContaminated(corpus, "doc_id", "text", corpus, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("contaminationReport: per-group hit counts and rates; zero-hit groups report 0") {
    val corpus = Seq(
      (1L, "a b c d e", "web"),  // contaminated
      (2L, "x y z w q", "web"),  // clean
      (3L, "q a b c q", "web"),  // contaminated
      (4L, "n o p r s", "books"), // clean
      (5L, "t u v w x", "books")  // clean -> books must still report 0
    ).toDF("doc_id", "text", "source")
    val bench = Seq("a b c").toDF("text")
    val got = Decontaminate.contaminationReport(
        corpus, "doc_id", "text", "source", bench, "text", n = 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      "web"   -> ((3L, 2L, 0.666667)),
      "books" -> ((2L, 0L, 0.0))))
  }

  test("contaminationReport: the NULL group is a real population, not a dropped zero") {
    val corpus = Seq(
      (1L, "a b c d e", null.asInstanceOf[String]), // contaminated, no source
      (2L, "x y z w q", null.asInstanceOf[String]), // clean, no source
      (3L, "q a b c q", "web")                      // contaminated
    ).toDF("doc_id", "text", "source")
    val bench = Seq("a b c").toDF("text")
    val got = Decontaminate.contaminationReport(
        corpus, "doc_id", "text", "source", bench, "text", n = 3)
      .collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      None        -> ((2L, 1L, 0.5)),
      Some("web") -> ((1L, 1L, 1.0))))
  }

  test("noveltyScores: novel fraction equals the exact join; all-novel and fully-seen edges") {
    val reference = Seq(
      (100L, "a b c d e"), (101L, "f g h i j")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "a b c d"),     // grams "a b c","b c d" both in reference -> 0 novel
      (2L, "p q r s"),     // grams "p q r","q r s" both novel -> rate 1.0
      (3L, "c d e f g h")  // "c d e","f g h" seen; "d e f","e f g" novel -> 0.5
    ).toDF("doc_id", "text")
    val got = Decontaminate.noveltyScores(
        batch, "doc_id", "text", reference, "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 0L, 0.0)),
      2L -> ((2L, 2L, 1.0)),
      3L -> ((4L, 2L, 0.5))))
  }

  test("noveltyScores exact mode: identical to hashed mode on a collision-free corpus") {
    val reference = (0 until 40).map { i =>
      (100L + i, (0 until 8).map(t => s"r${i}_$t").mkString(" "))
    }.toDF("doc_id", "text")
    val batch = ((0 until 10).map { i => // near-copies: mostly seen grams
      (i.toLong, (0 until 8).map(t => s"r${i}_$t").mkString(" "))
    } ++ (10 until 20).map { i =>        // fresh docs: all-novel grams
      (i.toLong, (0 until 8).map(t => s"n${i}_$t").mkString(" "))
    }).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val hashed = rows(Decontaminate.noveltyScores(
      batch, "doc_id", "text", reference, "text", n = 3))
    val exact = rows(Decontaminate.noveltyScores(
      batch, "doc_id", "text", reference, "text", n = 3,
      exactGrams = true))
    assert(exact === hashed,
      "exact and hashed gram identity must agree when no hash collides")
    // and the exact mode's verdicts are right on their own terms
    val byId = exact.map(t => t._1 -> t._4).toMap
    assert((0L until 10L).forall(byId(_) === 0.0))
    assert((10L until 20L).forall(byId(_) === 1.0))
  }
}
