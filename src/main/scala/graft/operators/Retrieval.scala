package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Text, TopK}

/** BM25 top-k retrieval over a document corpus — the ranking half of the
  * decontamination/retrieval surface (the inverted index q82 exports is
  * the storage half; this is the scoring loop that runs against it).
  * In an LLM data pipeline this is how eval-set queries find their
  * near-matches in the training corpus when n-gram overlap (q64) is too
  * strict and embedding cosine (q28/q116) too loose.
  *
  * Okapi BM25 with Lucene's non-negative idf:
  * {{{
  *   score(q, d) = Σ_t  ln(1 + (N - df + 0.5)/(df + 0.5))
  *                      · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * }}}
  *
  * Scale design (100 TB corpus, a handful of queries):
  *   - the query-term table broadcasts; the corpus postings are pruned
  *     by that broadcast join BEFORE anything shuffles — only postings
  *     of queried terms ever leave the scan (a few thousand rows per
  *     term, not the corpus).
  *   - df / (N, avgdl) are one small broadcast and one 1-row frame; the
  *     corpus is scanned, never collected.
  *   - per-term contributions are rounded to integer MICRO-units before
  *     the per-(query, doc) sum, so the score is an order-independent
  *     integer — reproducible under any partitioning, and exactly
  *     replayable in SQL (the q105/q119 portability rule; double sums
  *     are summation-order-dependent).
  *   - top-k per query runs through the native bounded-heap aggregate
  *     ([[graft.functions.TopK.TopKPairs]]): O(n log k) map-side, ≤ k
  *     pairs per query per mapper in the shuffle — no global sort.
  *
  * Returns (query_id, rank, doc_id, score_micro), rank 1..k by
  * (score_micro DESC, doc_id ASC).
  */
object Retrieval {

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && k > 0, "bm25TopK needs queries and k > 0")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs.select(col(idCol).as("doc_id"),
      Text.tokens(col(textCol)).as("w"))
    val qdf = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    // (doc_id, dl, term, tf) for QUERIED terms only: the broadcast
    // term filter runs on the exploded token stream BEFORE the tf
    // aggregation, so the per-(doc, term) groupBy shuffles only
    // queried-term occurrences — never the corpus token stream. (The
    // r12 BM25 scale profile caught the previous shape grouping ALL
    // (doc, term) pairs first — a full-corpus shuffle the scaladoc
    // explicitly promises not to do — and, unmaterialized, doing it
    // twice: once under dfx, once under the score join. 10⁶ docs:
    // 11.0 → 3.0 s warm.) The pruned postings are bounded by queried-
    // term posting volume, so the eager localCheckpoint is scale-safe
    // (the SubstringDedup/distill precedent) and cuts the remaining
    // double tokenize: tf feeds BOTH df counting and scoring.
    val tf = base
      .select(col("doc_id"), size(col("w")).as("dl"),
        explode(col("w")).as("term"))
      .join(broadcast(qdf.select("term").distinct()), "term")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    // corpus scalars as a 1-row broadcast frame (never collected)
    val stats = base.agg(count(lit(1)).as("n"),
      avg(size(col("w"))).as("avgdl"))
    scoreAndRank(tf, qdf, stats, k, k1, b)
  }

  /** The BM25 scoring tail shared by the corpus-scan path above and the
    * persisted-index path ([[IndexLake.bm25TopKOverIndex]]): from a
    * pruned (doc_id, dl, term, tf) postings frame (one row per
    * (doc, term), queried terms only), a (query_id, term) table, and a
    * 1-row (n, avgdl) stats frame, to the ranked
    * (query_id, rank, doc_id, score_micro) result. df is counted from
    * the postings frame itself (one row per containing doc); every
    * per-term contribution is micro-rounded BEFORE the per-(query, doc)
    * sum, so the score is an order-independent exact integer — which is
    * what makes index == corpus-scan equality BIT-exact rather than
    * approximate.
    */
  private[operators] def scoreAndRank(tf: DataFrame, qdf: DataFrame,
      stats: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    // document frequency of queried terms (tf rows are one per
    // (doc, term), so count(*) = containing docs)
    val dfx = tf.groupBy("term").agg(count(lit(1)).as("df"))

    // the (N, avgdl) scalars stay a 1-row crossJoin(broadcast(stats)):
    // an eager driver-side collect-to-literal was MEASURED this round
    // (r18) and reverted — it holds the job count at 14 (q121) while
    // SERIALIZING the stats subtree (for the corpus path, a full
    // tokenize+agg) that AQE otherwise builds as an ASYNC broadcast
    // overlapping the scoring stages; paired runs lost ~0.3 s per
    // search. Guide §2.6: keep independent subtrees overlapped.
    val contrib: Column =
      log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
        (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) +
          lit(b) * col("dl") / col("avgdl"))) * lit(1e6)

    val scored = tf
      .join(broadcast(qdf), "term") // fan out terms to their queries
      .join(broadcast(dfx), "term")
      .crossJoin(broadcast(stats))
      .withColumn("contrib_micro", round(contrib).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_micro")).as("score_micro"))

    scored.groupBy(col("query_id"))
      .agg(TopK.topKPairs(col("score_micro"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("doc_id"), col("col.ord").as("score_micro"))
  }

  /** Exact vector ranking over 1e6-quantized embeddings: per query, the
    * top-k corpus ids by integer DOT PRODUCT (long multiply/add — rank
    * order bit-identical cross-engine, unlike float cosine whose
    * last-ulp ordering an SQL oracle cannot replay; on unit-norm-ish
    * embeddings dot order IS cosine order). Same shape as the BM25
    * tail: queries broadcast, corpus scanned ONCE, per-query bounded
    * heap — ≤ k pairs per query per mapper reach the shuffle, no
    * window sort anywhere near the corpus. `queries` is
    * (queryIdCol, vecCol); self-hits are not excluded (the query IS an
    * embedding — rank 1 = itself is well-defined and the oracle's
    * rule). Dot magnitude is bounded by dim·(scale·|x|max)² — dim 64 ×
    * (1e6)² ≈ 6·10¹³ « 2⁶³ for unit-range embeddings.
    */
  def quantizedDotTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, scale: Long = 1000000L): DataFrame = {
    import graft.functions.ArrayOps
    import graft.operators.Clustering.quantizeF
    val q = queries.select(col(queryIdCol).as("query_id"),
      quantizeF(col(queryVecCol), scale).as("qv"))
    val c = corpus.select(col(idCol).as("doc_id"),
      quantizeF(col(vecCol), scale).as("v"))
    c.crossJoin(broadcast(q))
      .select(col("query_id"), col("doc_id"),
        ArrayOps.dotL(col("qv"), col("v")).as("dot"))
      .filter(col("dot").isNotNull) // ragged/null vectors drop out
      .groupBy(col("query_id"))
      .agg(TopK.topKPairs(col("dot"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("doc_id"), col("col.ord").as("dot"))
  }

  /** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse any number of (query_id, doc_id, rank) rankings as
    * score = Σ_rankers round(1e9 / (rrfK + rank)) — ONE correctly-
    * rounded IEEE division + round per (ranker, hit), summed in exact
    * longs, so the fused order is bit-identical cross-engine (no
    * float accumulation; rrfK + rank ≤ a few hundred never divides
    * 2·10⁹ to an exact .5, so round ties cannot arise). A doc missing
    * from a ranker's top-N simply contributes nothing — RRF's rule.
    * Plan shape: union of k·|Q|-sized rank lists (tiny), one
    * (query, doc) sum, one per-query bounded heap. The hybrid
    * lexical+vector retrieval shape RAG-style pipelines run.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, rrfK: Int = 60)
      : DataFrame = {
    require(rankings.nonEmpty && k > 0, "rrfFuse needs rankings and k > 0")
    val uni = rankings.map(_.select(col("query_id"), col("doc_id"),
      col("rank"))).reduce(_ unionAll _)
    uni
      .select(col("query_id"), col("doc_id"),
        round(lit(1e9) / (lit(rrfK) + col("rank"))).cast("long")
          .as("contrib_nano"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_nano")).as("rrf_nano"))
      .groupBy(col("query_id"))
      .agg(TopK.topKPairs(col("rrf_nano"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("doc_id"), col("col.ord").as("rrf_nano"))
  }
}
