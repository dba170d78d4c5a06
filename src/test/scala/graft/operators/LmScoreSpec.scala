package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed add-one bigram LM scores on a three-document corpus,
  * plus the structural guarantees: every input document appears, short
  * documents score (0, 0), and the integer micro-rounding happens
  * per-bigram (order-independence of the sum).
  */
class LmScoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("hand-computed scores on a tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a"),
      (2L, "a b"),
      (3L, "c")).toDF("doc_id", "text")
    // tokens: uni a:3 b:2 c:1 → V=3; bigrams (a,b):2 (b,a):1
    //   contrib(a,b) = ln((2+1)/(3+3)) = ln(0.5)  → round(-693147.18)  = -693147
    //   contrib(b,a) = ln((1+1)/(2+3)) = ln(0.4)  → round(-916290.73) = -916291
    val out = LmScore.bigramScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out === Seq(
      (1L, 2L, -693147L - 916291L),
      (2L, 1L, -693147L),
      (3L, 0L, 0L)))
  }

  test("deterministic across partitionings") {
    import spark.implicits._
    val docs = (1L to 200L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 7} w${i % 3}"))
      .toDF("doc_id", "text")
    def run(parts: Int) =
      LmScore.bigramScore(docs.repartition(parts), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(run(1) === run(13))
  }
}
