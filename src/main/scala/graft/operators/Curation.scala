package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The composite training-data curation pipeline as ONE user-facing
  * operator — the job shape a corpus owner actually runs (q105 is its
  * driver-oracled instance): normalize → exact dedup on the normalized
  * body → shingle-set dedup (threshold-1.0 fast path) + distributed
  * cluster collapse → length/repetition quality filter → token-budget
  * packing.
  *
  * Scale design: every stage keeps its audited shape — exact-dup and
  * shingle-dedup shuffle (id, hash/set) projections, losers are
  * broadcast-anti-joined so the corpus is filtered in place, the quality
  * scores are reduced to per-doc ints inside a projection and PERSISTED
  * before the filter (a predicate over the computed gram arrays would be
  * alias-substituted down through the tokens/normalize projections by
  * pushdown, re-evaluating two regex passes per lambda index access —
  * measured 30+ s per stage at sf0.1), and packing pays its single
  * window shuffle. Composing the stages adds no shuffle beyond their
  * own.
  */
object Curation {

  /** Curated survivors: `(doc_id, lang, nt)` — normalized text of every
    * document that survives exact dedup, near(exact-shingle) dedup, and
    * the quality filter. Survivor identity is deterministic: the minimum
    * id of each duplicate group.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, minTokens: Int = 5,
      maxRepetition: Double = 0.2): DataFrame = {
    // the 3-gram expression below indexes tokens[i+2] for every position
    // the length filter admits — a smaller minTokens would index past the
    // array (ANSI: INVALID_ARRAY_INDEX) or fabricate short grams
    require(minTokens >= 3, s"minTokens must be >= 3, got $minTokens")
    // narrow (id, lang, normalized-text) projection, persisted: four
    // downstream consumers (exact-dup aggregate, its semi join, the
    // dedup stages via s1, the quality scorer) would otherwise each
    // re-run the two-regex normalize over the full corpus
    val base = docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        Text.normalize(col(textCol)).as("nt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact dedup — one survivor (min id) per byte-identical normalized
    // body; the semi join shuffles (id, hash) pairs only
    val exactKeep = Dedup.exact(base, "doc_id", "nt")
      .select(col("keep_id").as("doc_id"))
    // persisted too: the shingle dedup, the anti-join, and the scorer all
    // consume the survivors — the semi join runs once, not per consumer
    val s1 = base.join(exactKeep, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // shingle-set dedup (threshold 1.0 = the one-shuffle window-marked
    // fast path) → connected components → collapsed corpus
    val cl = Dedup.clusters(Dedup.minhashLsh(s1, "doc_id", "nt",
      threshold = 1.0))
    val s2 = Dedup.dedupedCorpus(s1, "doc_id", cl)
    // quality filter: minimum length + Gopher-style repetition
    // (duplicate-3-gram mass > maxRepetition drops the doc)
    val grams = expr(
      "transform(sequence(0, size(tokens) - 3), " +
      "i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))")
    val scored = s2.select(col("doc_id"), col("lang"),
        col("nt"), Text.tokens(col("nt")).as("tokens"))
      .withColumn("nw", size(col("tokens")).cast("long"))
      .filter(col("nw") >= minTokens)
      .withColumn("g", grams)
      .select(col("doc_id"), col("lang"), col("nt"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_uniq"))
      // pushdown barrier — see the object Scaladoc
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the pipeline is already eager (the cluster collapse above ran its
    // fixpoint actions), so materialize the compact per-doc scores and
    // RELEASE the wide upstream caches: base and s1 have served every
    // consumer once scored exists, and holding them would accumulate
    // full-corpus cached copies across repeated curate() calls in one
    // session. The returned frame reads only scored; if its blocks are
    // later evicted, recompute walks the unpersisted lineage —
    // correctness unaffected. Dedup-internal persists (the exact-dup
    // window marks, the cluster loop's edge RDD) are session-scoped;
    // long-lived sessions release them with a catalog/RDD cache clear
    // between runs, as Verify/Bench/ScaleProfile do.
    scored.count(): Unit
    base.unpersist(blocking = false)
    s1.unpersist(blocking = false)
    scored
      .filter(!(lit(1.0) -
        col("n_uniq").cast("double") / col("n_grams") > lit(maxRepetition)))
      .select(col("doc_id"), col("lang"), col("nt"))
  }

  /** [[curate]] then token-budget packing: `(doc_id, lang, n_tokens,
    * pack_id)` — the pre-training export layout.
    */
  def curateAndPack(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, budget: Long = 2048L, minTokens: Int = 5,
      maxRepetition: Double = 0.2): DataFrame =
    Packing.packByBudget(
      curate(docs, idCol, textCol, langCol, minTokens, maxRepetition),
      "doc_id", "nt", "lang", budget)

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * document under the corpus bigram LM ([[LmScore.bigramScore]]),
    * normalize to a per-bigram average, and split each language into
    * `nBuckets` equal-depth buckets by that average — bucket 1 ("head")
    * = least surprising under the LM, bucket `nBuckets` ("tail") = most.
    * CCNet trains on head+middle and drops the tail; the buckets are
    * returned, the cut is the caller's policy.
    *
    * Integer-portable: the average is `score_micro × 1000 div
    * max(n_bigrams, 1)` — both engines truncate integer division toward
    * zero — in nano-log units (`avg_logp_nano`); ordering ties break on
    * doc id, so the ntile assignment is deterministic under any
    * partitioning. Docs with no bigrams score 0 (they sort with the
    * head; a real pipeline length-filters first).
    *
    * Scale shape: the LM scoring keeps its audited shape (Zipf-bounded
    * count tables, partial aggregation); bucketing adds ONE window
    * shuffle on the language key — same cost class as q66's mixture
    * sampling. A language's docs sort within its partitions; for a
    * single giant language the equal-depth split would want the q125
    * exact-quantile cut points instead of a global sort — documented
    * trade, not needed at benchmark scale.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets=$nBuckets must be >= 2")
    val scored = LmScore.bigramScore(docs, idCol, textCol,
      passthrough = Seq(langCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("avg_logp_nano").desc, col("doc_id").asc)
    scored
      .withColumn("avg_logp_nano",
        expr("(score_micro * 1000L) div greatest(n_bigrams, 1L)"))
      .withColumn("bucket", ntile(nBuckets).over(w).cast("long"))
  }

  /** Rare-sequence exposure screen — the memorization/PII risk audit
    * (cf. Carlini et al. 2022, "Quantifying Memorization", arXiv:
    * 2202.07646: models regurgitate sequences that are RARE in the
    * corpus; a document whose n-grams appear almost nowhere else is the
    * document a model can leak verbatim and the first place secrets,
    * keys and personal records hide). For every document: its distinct
    * word n-gram count, the corpus document-frequency of its RAREST
    * n-gram, how many of its n-grams fall under `minDf`, and the flag.
    * Output: (idCol, n_grams, min_df, n_rare, risky) for every doc with
    * ≥ n tokens. A fully-boilerplate doc reports min_df = its grams'
    * df, risky = false — rarity is the signal here, commonality the
    * safe case (the exact complement of the dedup family).
    *
    * Scale shape (100 TB): the gram stream is already one row per
    * (gram, doc) — per-doc distinct at the explode — so the df
    * aggregate is map-side-combined down to one row per distinct gram
    * before its exchange, and the rollup joins reduction-vs-df on the
    * gram key: the corpus TEXT is never re-read for the rollup, only
    * the (gram, doc) projection is derived twice (once per join side —
    * a map-side explode each time, cheaper at scale than the
    * sort-the-world window that would make it single-pass). Everything
    * shuffled is (gram, doc) pairs or gram counts — linear, nothing
    * collected; the deliberately-NOT-chosen shape is a window over the
    * corpus gram stream.
    */
  def rareSequenceScreen(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDf: Long = 2L): DataFrame = {
    // one row per (gram, doc) by construction: the per-doc distinct
    // happens inside the array before the explode
    val perDoc = docs.select(col(idCol).cast("long").as("id"),
        explode(array_distinct(
          Text.shingles(Text.tokens(col(textCol)), n))).as("g"))
    val df = perDoc.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
    perDoc.join(df, Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        min(col("gdf")).as("min_df"),
        sum(when(col("gdf") < minDf, 1L).otherwise(0L)).as("n_rare"))
      .select(col("id").as(idCol), col("n_grams"), col("min_df"),
        col("n_rare"), (col("n_rare") > 0).as("risky"))
  }

  /** INTRA-document repeated-span scrub — within-doc dedup, the
    * per-document twin of the corpus-wide q139 substring removal:
    * every n-token window whose gram already occurred at an earlier
    * position in the SAME document is dropped (the first occurrence's
    * window stays), and the document is rebuilt from the surviving
    * tokens in order. This is the cleanup for degenerate repetition
    * that the Gopher FILTERS (q65/q141) only flag — template headers
    * repeated mid-page, LM-generated loops, navigation blocks pasted
    * twice — where dropping the whole document would waste its unique
    * half. Output: (idCol, clean_text, n_tokens, n_dropped) for every
    * input document.
    *
    * Scale shape: a pure per-row kernel
    * ([[graft.functions.ArrayOps.dropRepeatedSpanTokens]] — one pass,
    * one gram→first-position map per row) inside a projection — ZERO
    * shuffles, no state, embarrassingly parallel at any corpus size.
    * Gram identity is the 64-bit FNV kernel (the q27 convention:
    * equal to string n-grams up to 2^-64-per-pair collisions); the
    * oracle replays the rule on exact gram STRINGS.
    */
  def scrubRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val kept = graft.functions.ArrayOps.dropRepeatedSpansF(toks, n)
    docs.select(col(idCol),
      array_join(kept, " ").as("clean_text"),
      size(toks).cast("long").as("n_tokens"),
      (size(toks) - size(kept)).cast("long").as("n_dropped"))
  }
}
