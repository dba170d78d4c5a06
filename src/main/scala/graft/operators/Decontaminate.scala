package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Benchmark decontamination — the n-gram-overlap hygiene pass every
  * pre-training pipeline runs before training: any corpus document that
  * shares a long word n-gram with an evaluation/benchmark document is
  * flagged (and usually dropped), so downstream eval scores measure
  * generalization rather than memorization of leaked test items.
  *
  * Scale shape (the part that matters at 100 TB): benchmark sets are
  * eval suites, not corpora — thousands of documents, not billions — so
  * their distinct n-gram set is BROADCAST-sized by nature. The corpus
  * side explodes its (per-doc distinct) n-grams map-side, the overlap
  * test is a BroadcastHashJoin left-semi (no corpus shuffle), and only
  * the HITS — bounded by the contamination rate, which is tiny for any
  * honest corpus — flow into the per-doc count aggregation and the
  * broadcast flag-join back onto the corpus. The whole operator
  * shuffles O(contaminated n-grams), never O(corpus).
  */
object Decontaminate {

  /** The shared hit aggregate: (idCol, n_hit_grams) for the CONTAMINATED
    * documents only — one corpus gram scan, one O(hits) count shuffle.
    * Every public entry point builds on this so none pays a corpus-wide
    * flag join it then filters back down (the report/removal forms only
    * ever need the hit set, which is bounded by the contamination rate).
    */
  private def hitGramCounts(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(Text.shingles(Text.tokens(col(benchTextCol)), n))
        .as("gram"))
      .distinct()
    val docGrams = corpus.select(col(idCol),
      explode(array_distinct(Text.shingles(Text.tokens(col(textCol)), n)))
        .as("gram"))
    // left-semi against the broadcast benchmark set keeps only hit
    // pairs; the count shuffle then carries O(hits) rows
    docGrams
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Per-document contamination flags: (idCol, n_hit_grams,
    * contaminated) for EVERY corpus document. `n_hit_grams` counts the
    * doc's DISTINCT word n-grams that appear anywhere in the benchmark
    * set; `contaminated` is `n_hit_grams > 0`. Documents shorter than
    * `n` tokens have no n-grams and are never contaminated.
    */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val hits = hitGramCounts(corpus, idCol, textCol, bench, benchTextCol, n)
    // hits is bounded by the contamination rate; broadcast it back so
    // flagging the full corpus stays map-side. (If a pathological run
    // contaminates a large fraction of the corpus, drop the hint and
    // let AQE choose — correctness is unchanged.)
    corpus.select(col(idCol))
      .join(broadcast(hits), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        coalesce(col("n_hit_grams") > 0, lit(false)).as("contaminated"))
  }

  /** The removal form: corpus rows whose document shares no word
    * n-gram with the benchmark set — a broadcast left-anti against the
    * contaminated-id set (same bounds as [[flagContaminated]], minus
    * the corpus-wide flag join the anti-join never needed).
    */
  def removeContaminated(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 8): DataFrame = {
    val contaminatedIds = hitGramCounts(corpus, idCol, textCol,
      bench, benchTextCol, n).select(col(idCol))
    corpus.join(broadcast(contaminatedIds), Seq(idCol), "left_anti")
  }

  /** Per-group contamination governance report — the number every
    * data-sourcing decision actually consumes: for each group (source,
    * domain, crawl snapshot, …), how many documents are contaminated
    * and at what rate. Output: (groupCol, n_docs, n_contaminated,
    * contamination_rate) for EVERY group (zero-hit groups report 0).
    * A NULL group is itself a reported population — unattributed
    * documents are exactly what a governance report must not lose — so
    * the rollup join is NULL-SAFE (`<=>`).
    *
    * Scale shape: group totals are one map-side-combined aggregate over
    * the corpus (no joins); the contaminated side starts from the HIT
    * set (bounded by the contamination rate), resolves each hit id to
    * its group with a broadcast join against the corpus scan, and
    * aggregates — so the report costs the gram scan + one corpus scan
    * per side plus O(contaminated) join work, never a corpus-sized
    * shuffle.
    */
  def contaminationReport(corpus: DataFrame, idCol: String,
      textCol: String, groupCol: String, bench: DataFrame,
      benchTextCol: String, n: Int = 8): DataFrame = {
    val hits = hitGramCounts(corpus, idCol, textCol, bench,
      benchTextCol, n).select(col(idCol))
    val totals = corpus.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    // distinct alias on the contaminated side so the null-safe join
    // condition can't collapse into a same-exprId self-join ambiguity
    val contaminated = corpus.select(col(idCol), col(groupCol).as("__grp"))
      .join(broadcast(hits), Seq(idCol), "left_semi")
      .groupBy(col("__grp"))
      .agg(count(lit(1)).as("n_contaminated"))
    totals.join(contaminated, col(groupCol) <=> col("__grp"), "left")
      .select(col(groupCol), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L))
          .cast("double") / col("n_docs"), 6).as("contamination_rate"))
  }

  /** Per-document n-gram NOVELTY against a reference corpus — the
    * "how much new information does this batch add" score behind crawl
    * triage and incremental-ingest prioritization: for each batch
    * document, the fraction of its distinct word n-grams that appear
    * nowhere in the reference corpus. Output: (idCol, n_grams, n_novel,
    * novelty_rate) for every batch document with at least one n-gram.
    *
    * Scale shape — the reference side is a CORPUS, not an eval suite,
    * so (unlike [[flagContaminated]]) its gram set cannot broadcast.
    * The operator therefore runs q71's Bloom discipline inverted: a
    * bounded Bloom sketch of the reference grams is built once
    * (constant-size broadcast regardless of corpus size) and batch
    * grams that MISS the filter are definitively novel — a Bloom has no
    * false negatives — so they never enter the join at all. Only the
    * bloom-HIT candidates (true matches + the engineered false-positive
    * sliver) are exactly verified against the reference gram set with a
    * shuffle semi-join, making the expensive exact path proportional to
    * the OVERLAP, which is the small side by definition when scoring
    * novelty of fresh data. The bloom itself is an invisible plan
    * optimization — the output equals the same join run without it.
    * Gram identity defaults to the 64-bit `ngramHashes` kernel (the
    * q27/q43/q64 convention), NOT exact gram strings as in
    * [[flagContaminated]]: a 2^-64-per-pair hash collision between a
    * novel batch gram and any reference gram would count it as seen.
    * When the report is LOAD-BEARING, run with `exactGrams = true`:
    * gram identity becomes the exact n-gram string — the bloom still
    * prefilters on the string's 64-bit hash (a bloom MISS is
    * definitively novel either way), but bloom hits are verified with
    * an exact string join, so a hash collision can only cost one wasted
    * verification row, never a wrong count. The exact mode's join keys
    * are strings (wider shuffle rows on the overlap), which is the
    * price of the identity guarantee; the plan shape is identical.
    */
  def noveltyScores(batch: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, n: Int = 3,
      exactGrams: Boolean = false): DataFrame = {
    import graft.functions.{ArrayOps, Bloom}
    def grams(c: org.apache.spark.sql.Column) =
      if (exactGrams) array_distinct(Text.shingles(Text.tokens(c), n))
      else ArrayOps.ngramHashes(Text.tokens(c), n)
    def bloomKey(g: org.apache.spark.sql.Column) =
      if (exactGrams) xxhash64(g) else g
    val rawRefGrams = reference
      .select(explode(grams(col(refTextCol))).as("g"))
    // the bloom builds from the RAW gram stream — bit_or is idempotent,
    // so paying a distinct shuffle before it would be a wasted full
    // reference pass; the distinct set exists only for the verify join
    val bloom = Bloom.build(
      rawRefGrams.select(bloomKey(col("g")).as("g")), "g")
    val refGrams = rawRefGrams.distinct()
    val batchGrams = batch.select(col(idCol),
      explode(grams(col(textCol))).as("g"))
    val totals = batchGrams.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val seen = batchGrams
      .filter(Bloom.mightContain(bloom, bloomKey(col("g"))))
      .join(refGrams, Seq("g"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_seen"))
    totals.join(seen, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        (col("n_grams") - coalesce(col("n_seen"), lit(0L)))
          .as("n_novel"),
        round((col("n_grams") - coalesce(col("n_seen"), lit(0L)))
          .cast("double") / col("n_grams"), 6).as("novelty_rate"))
  }
}
