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

  /** Per-document contamination flags: (idCol, n_hit_grams,
    * contaminated) for EVERY corpus document. `n_hit_grams` counts the
    * doc's DISTINCT word n-grams that appear anywhere in the benchmark
    * set; `contaminated` is `n_hit_grams > 0`. Documents shorter than
    * `n` tokens have no n-grams and are never contaminated.
    */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(Text.shingles(Text.tokens(col(benchTextCol)), n))
        .as("gram"))
      .distinct()
    val docGrams = corpus.select(col(idCol),
      explode(array_distinct(Text.shingles(Text.tokens(col(textCol)), n)))
        .as("gram"))
    // left-semi against the broadcast benchmark set keeps only hit
    // pairs; the count shuffle then carries O(hits) rows
    val hits = docGrams
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_hit_grams"))
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
    * contaminated-id set (same bounds as [[flagContaminated]]).
    */
  def removeContaminated(corpus: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchTextCol: String,
      n: Int = 8): DataFrame = {
    val contaminatedIds = flagContaminated(corpus, idCol, textCol,
      bench, benchTextCol, n)
      .filter(col("contaminated")).select(col(idCol))
    corpus.join(broadcast(contaminatedIds), Seq(idCol), "left_anti")
  }
}
