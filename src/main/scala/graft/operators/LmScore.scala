package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** N-gram language-model quality scoring — the perplexity-proxy filter
  * of web-corpus curation (CCNet-style: score each document under a
  * corpus-level LM, drop the tail): an add-one-smoothed word-bigram
  * model trained on the corpus itself, every document scored as the
  * sum of its bigrams' conditional log-probabilities.
  *
  * {{{
  *   score(d) = Σ_{(t, nxt) ∈ bigrams(d)} ln( (c(t, nxt) + 1) / (c(t) + V) )
  * }}}
  *
  * Integer-portable by the q105/q121 micro-rounding rule: each bigram's
  * contribution rounds to BIGINT micro-units BEFORE the per-document
  * sum, so the score is a summation-order-independent integer —
  * reproducible under any partitioning and exactly replayable in SQL
  * (the oracle rebuilds the same counts and the same expression tree).
  * More negative = more surprising under the corpus LM; the score is
  * length-biased by construction, so consumers threshold on
  * score_micro / n_bigrams (exposed separately to keep both integers).
  *
  * Scale shape (100 TB corpus):
  *   - counts are two map-side-combined aggregations (unigrams,
  *     bigrams) — Zipf-bounded model tables, never collected;
  *   - V is a 1-row broadcast frame;
  *   - scoring joins the per-document bigram stream against the two
  *     count tables on their natural keys — partial aggregation before
  *     every exchange, nothing driver-side;
  *   - the per-document sum is one hash aggregation on doc id.
  *
  * Output: (doc_id, n_bigrams, score_micro) for EVERY input document
  * (< 2 tokens ⇒ 0 bigrams, score 0).
  */
object LmScore {

  /** `passthrough` columns of `docs` (e.g. a language column) ride
    * along on the final per-document join at no extra cost — the
    * score re-attaches to the corpus there anyway.
    */
  def bigramScore(docs: DataFrame, idCol: String,
      textCol: String, passthrough: Seq[String] = Nil): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      Text.tokens(col(textCol)).as("w"))

    val uni = tok.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))

    // (doc_id, t, nxt) — one row per in-document bigram occurrence
    val pairs = tok
      .select(col("doc_id"), explode(
        expr("transform(slice(w, 1, greatest(size(w) - 1, 0))," +
          " (x, i) -> struct(x AS t, w[i + 1] AS nxt))")).as("p"))
      .select(col("doc_id"), col("p.t"), col("p.nxt"))

    val big = pairs.groupBy("t", "nxt").agg(count(lit(1)).as("c2"))

    val scored = pairs
      .join(big, Seq("t", "nxt"))
      .join(uni, Seq("t"))
      .crossJoin(broadcast(vocab))
      .withColumn("m", round(
        log((col("c2") + lit(1.0)) / (col("c1") + col("v"))) * lit(1e6))
        .cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("m")).as("score_micro"))

    docs.select(col(idCol).as("doc_id") +: passthrough.map(col): _*)
      .join(scored, Seq("doc_id"), "left")
      .select(Seq(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro")) ++
        passthrough.map(col): _*)
  }
}
