package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** BM25 contract: exact micro-unit scores against a scalar reference
  * implementation, ranking with doc-id tie-break, and bit-identical
  * results under any partitioning (the per-term integer rounding rule).
  */
class RetrievalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val corpus = Seq(
    (1L, "apple banana apple cherry"),       // tf(apple)=2, dl=4
    (2L, "apple banana banana banana"),      // tf(banana)=3, dl=4
    (3L, "cherry cherry cherry durian fig"), // rare terms, dl=5
    (4L, "banana"),                          // short doc, dl=1
    (5L, "fig grape grape apple fig grape")) // dl=6

  /** Scalar BM25 reference — same formula, same rounding discipline. */
  private def expected(qTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / corpus.size
    corpus.flatMap { case (id, _) =>
      val w = toks(id)
      val dl = w.size.toDouble
      val score = qTerms.map { t =>
        val tf = w.count(_ == t).toDouble
        if (tf == 0) 0L
        else {
          val df = toks.values.count(_.contains(t)).toDouble
          val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
          math.round(
            idf * (tf * (k1 + 1)) /
              (tf + k1 * (1 - b + b * dl / avgdl)) * 1e6)
        }
      }.sum
      if (score == 0L) None else Some(id -> score)
    }.toMap
  }

  test("scores match the scalar reference exactly; rank breaks ties on doc_id") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq(7L -> Seq("apple", "durian")), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = expected(Seq("apple", "durian"))
    val ranked = exp.toSeq.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
    assert(out.toSeq === ranked)
  }

  test("results are partitioning-invariant and k bounds the output") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val q = Seq(1L -> Seq("banana", "fig"), 2L -> Seq("apple"))
    val a = Retrieval.bm25TopK(docs.repartition(1), "doc_id", "text", q, 2)
      .collect().toSet
    val c = Retrieval.bm25TopK(docs.repartition(7), "doc_id", "text", q, 2)
      .collect().toSet
    assert(a === c)
    assert(a.groupBy(_.getLong(0)).values.forall(_.size <= 2))
  }

  test("quantizedDotTopK: exact integer dot ranking, self at rank 1, " +
      "ragged vectors drop out") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)),
      (4L, Seq(0.5f, 0.5f)),
      (5L, Seq(1.0f))) // ragged — must never rank
      .toDF("vec_id", "embedding")
    val out = Retrieval.quantizedDotTopK(emb, "vec_id", "embedding",
        emb.filter($"vec_id" === 1L), "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // dots vs (1e6, 0): id1=1e12, id2=0.9e12, id4=0.5e12, id3=0, id5=null
    assert(out.toSeq === Seq(
      (1L, 1L, 1000000000000L),
      (2L, 2L, 900000000000L),
      (3L, 4L, 500000000000L)))
  }

  test("rrfFuse: hand-computed fusion, one-ranker docs count once, " +
      "tie breaks on doc_id") {
    import spark.implicits._
    // ranker A: d20=1, d10=2 ; ranker B: d20=1, d30=2
    val a = Seq((1L, 20L, 1L), (1L, 10L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1L), (1L, 30L, 2L))
      .toDF("query_id", "doc_id", "rank")
    def c(r: Long) = math.round(1e9 / (60 + r))
    val out = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // d20 counted once per ranker (2·c(1)); d10 and d30 appear in ONE
    // ranker each at rank 2 -> EQUAL fused scores -> doc_id tie-break
    assert(out.toSeq === Seq(
      (1L, 20L, 2 * c(1)),
      (2L, 10L, c(2)),
      (3L, 30L, c(2))))
  }
}
