package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.
  * 2016's word-level merge loop) — the missing first stage of every LLM
  * data pipeline: learn the merge table FROM the corpus, exactly.
  *
  * Algorithm (faithful to the published one): pre-tokenize on
  * whitespace, count word frequencies once, represent each distinct
  * word as a character segmentation; each round, count adjacent symbol
  * pairs weighted by word frequency, take the globally most frequent
  * pair (total order: count DESC, left ASC, right ASC — so training is
  * DETERMINISTIC and bit-reproducible under any partitioning, like
  * [[Graph.pageRank]]'s integer mass), merge that pair in every word,
  * repeat.
  *
  * Scale shape: the corpus is touched ONCE (word count); every round
  * after that runs over the DISTINCT-WORD table (Zipf: orders of
  * magnitude smaller than the corpus, still fully distributed — never
  * collected). Per round: one map-side-combined aggregation over
  * adjacent pairs (shuffle = distinct pairs, not occurrences), one
  * bounded top-1 (TakeOrdered), one broadcast-literal `replace` over
  * the word table, persisted and released like the graph rounds. The
  * driver holds exactly `rounds` chosen pairs.
  *
  * Segmentations live as SENTINEL-DELIMITED STRINGS, not arrays:
  * `\u0001 l \u0001\u0001 r \u0001` wraps every symbol, so applying a
  * merge is one codegen'd left-to-right `replace` of
  * `␁l␁␁r␁ → ␁lr␁` — non-overlapping by the scan order (aaa + (a,a)
  * → [aa, a]), boundary-exact (a pair can never match inside a longer
  * symbol because the pattern requires the closing/opening sentinels),
  * and byte-for-byte replayable in ANSI SQL (`replace` has identical
  * semantics in DuckDB — q128's oracle unrolls the rounds as CTEs).
  * Words containing the sentinel are dropped (impossible in text that
  * tokenizes on whitespace; the guard keeps the encoding total).
  */
object Bpe {

  private val S = "\u0001"
  private val SS = S + S

  /** Learn `rounds` merges. Output: one row per learned rule —
    * (round 1.., lhs, rhs, pair_count) in training order; stops early
    * if no pair remains (every word a single symbol).
    */
  def trainMerges(docs: DataFrame, textCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._

    var words = docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(S))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(concat(lit(S),
        array_join(filter(split(col("word"), ""), s => length(s) > 0),
          SS), lit(S)).as("seg"),
        col("freq"))
      .persist()
    words.count(): Unit

    val rules = Seq.newBuilder[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      // adjacent symbol pairs of every word, weighted by word frequency;
      // arrays_zip of the two shifted slices is empty for 1-symbol words
      val best = words
        .withColumn("s",
          split(expr("substring(seg, 2, length(seg) - 2)"), SS))
        .select(col("freq"), explode(expr(
          "arrays_zip(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1))"))
          .as("p"))
        .groupBy(col("p.0").as("lhs"), col("p.1").as("rhs"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("lhs"), asc("rhs"))
        .limit(1).collect() // bounded: exactly one row crosses the driver
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rules += ((round.toLong, l, r, c))
        val next = words
          .withColumn("seg", org.apache.spark.sql.functions.replace(
            col("seg"), lit(S + l + SS + r + S), lit(S + l + r + S)))
          .persist()
        next.count(): Unit
        words.unpersist(blocking = false)
        words = next
        round += 1
      }
    }
    words.unpersist(blocking = false)
    rules.result().toDF("round", "lhs", "rhs", "pair_count")
  }

  /** Scale path for REAL vocabularies: learn up to `merges` rules in
    * O(merges / maxBatch) Spark rounds instead of one driver round-trip
    * + persist per merge ([[trainMerges]] is the faithful sequential
    * loop the q128 oracle replays; a 32k-merge vocab through it is 10⁵
    * Spark jobs — this is the same algorithm batched).
    *
    * Each round counts pairs ONCE, collects the top `4·maxBatch`
    * candidates (bounded), and greedily keeps up to `maxBatch` pairs
    * that are SYMBOL-DISJOINT from every earlier pick of the round —
    * neither side may be a symbol an earlier pick consumes (`used`) or
    * creates (`produced`). Under that guard each kept pair's pre-batch
    * count is still its exact occurrence count when its `replace` runs
    * (a replace only touches its own two symbols and creates its own
    * concatenation), so every learned rule carries a true count and
    * the whole batch applies as one chained codegen'd projection.
    *
    * Deviation from strict sequential BPE (documented, standard in
    * fast trainers): within a round, pick k+1 is chosen from the
    * PRE-round counts, so a pair involving a symbol minted earlier in
    * the same round can only be learned next round. `maxBatch = 1`
    * reproduces [[trainMerges]] exactly (spec-pinned). Output schema
    * and ordering identical: (round = global merge index 1.., lhs,
    * rhs, pair_count) in application order — [[encodeWords]] over this
    * table reproduces training's final segmentations because the
    * global fold order equals the training application order.
    */
  def trainMergesBatched(docs: DataFrame, textCol: String,
      merges: Int, maxBatch: Int = 64): DataFrame = {
    require(merges >= 1 && maxBatch >= 1,
      s"merges=$merges maxBatch=$maxBatch must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._

    // Lineage is CUT each round by materializing the word table into an
    // OWNED, persisted RDD and re-wrapping it as a DataFrame, not just
    // persisting: a round applies up to `maxBatch` nested `replace`
    // expressions, so over merges/maxBatch rounds a persisted-only
    // chain accumulates O(merges) nested string expressions in the
    // logical plan — plan stringification alone goes quadratic and
    // OOMs the driver near 10³ merges (measured in tools/BpeProfile).
    // Re-wrapped rounds keep the plan O(maxBatch) forever. Holding the
    // round's RDD DIRECTLY (instead of diffing the context's global
    // persistent-RDD registry around a localCheckpoint, as earlier
    // revisions did) makes release exact by construction: only the RDD
    // this trainer persisted is ever unpersisted, so a concurrent job's
    // cache on the shared SparkContext can never be captured and
    // dropped by mistake. Each superseded round is released explicitly
    // once the next round materializes (waiting for the ContextCleaner
    // to GC it would stack hundreds of word-table copies over a
    // 500-round vocabulary).
    def checkpointTracked(df: org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame,
           org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val rdd = df.rdd.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // localCheckpoint truncates RDD DEPENDENCIES at the count below —
      // re-wrapping alone cuts only the SQL plan, and the narrow RDD
      // chain (each round's RDD computed from the previous round's)
      // would still grow O(rounds) deep: task binaries serialize the
      // whole ancestor graph, and a lost cached block would recompute
      // through every unpersisted ancestor back to round 0. Releasing a
      // truncated round is safe by construction: once the NEXT round's
      // count has run, its lineage no longer references this RDD.
      //
      // FAULT-TOLERANCE CONTRACT: localCheckpoint trades recompute for
      // speed — its blocks are the ONLY copy, so losing an executor
      // that holds them (node failure, dynamic-allocation decommission)
      // fails the training job instead of recomputing, exactly as
      // Spark's own scaladoc warns. That is the right default here:
      // training reruns from the docs table deterministically, and the
      // alternative (reliable rdd.checkpoint to a checkpoint dir) costs
      // a distributed write EVERY round of a possibly-500-round loop.
      // On clusters where a multi-hour run must survive executor loss,
      // disable dynamic allocation for the job or set a checkpoint dir
      // and swap this call for rdd.checkpoint() — the loop needs no
      // other change.
      rdd.localCheckpoint()
      rdd.count(): Unit // eager: the lineage behind it never re-runs
      (spark.createDataFrame(rdd, df.schema), rdd)
    }
    def release(rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])
        : Unit = rdd.unpersist(blocking = false): Unit
    var (words, wordsRdd) = checkpointTracked(docs
      .select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(S))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(concat(lit(S),
        array_join(filter(split(col("word"), ""), s => length(s) > 0),
          SS), lit(S)).as("seg"),
        col("freq")))

    val rules = Seq.newBuilder[(Long, String, String, Long)]
    var learned = 0
    var exhausted = false
    while (learned < merges && !exhausted) {
      val want = math.min(maxBatch, merges - learned)
      val cands = words
        .withColumn("s",
          split(expr("substring(seg, 2, length(seg) - 2)"), SS))
        .select(col("freq"), explode(expr(
          "arrays_zip(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1))"))
          .as("p"))
        .groupBy(col("p.0").as("lhs"), col("p.1").as("rhs"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("lhs"), asc("rhs"))
        .limit(4 * want).collect() // bounded: 4·batch candidate rows
      if (cands.isEmpty) exhausted = true
      else {
        val used = collection.mutable.Set.empty[String]
        val produced = collection.mutable.Set.empty[String]
        val picked = Seq.newBuilder[(String, String, Long)]
        var n = 0
        for (r <- cands if n < want) {
          val (l, rr) = (r.getString(0), r.getString(1))
          if (!used(l) && !used(rr) && !produced(l) && !produced(rr)) {
            picked += ((l, rr, r.getLong(2)))
            used += l; used += rr; produced += (l + rr)
            n += 1
          }
        }
        val batch = picked.result()
        batch.foreach { case (l, r, c) =>
          learned += 1
          rules += ((learned.toLong, l, r, c))
        }
        val seg = batch.foldLeft(col("seg")) { case (acc, (l, r, _)) =>
          org.apache.spark.sql.functions.replace(
            acc, lit(S + l + SS + r + S), lit(S + l + r + S))
        }
        val (next, nextRdd) = checkpointTracked(
          words.select(seg.as("seg"), col("freq")))
        release(wordsRdd) // the new round is materialized; drop old
        words = next
        wordsRdd = nextRdd
      }
    }
    release(wordsRdd)
    rules.result().toDF("round", "lhs", "rhs", "pair_count")
  }

  /** Apply a learned merge table to a word column: (word → space-joined
    * symbol sequence). The merges MUST be applied in training order —
    * the same left-to-right `replace` fold as training, so
    * encode(train corpus) reproduces training's final segmentations.
    */
  def encodeWords(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val seg0 = concat(lit(S),
      array_join(filter(split(col(wordCol), ""), s => length(s) > 0), SS),
      lit(S))
    val seg = merges.foldLeft(seg0) { case (acc, (l, r)) =>
      org.apache.spark.sql.functions.replace(
        acc, lit(S + l + SS + r + S), lit(S + l + r + S))
    }
    // same sentinel guard as training: a word CONTAINING the sentinel
    // would corrupt its own delimiter stream — encode it as NULL (this
    // is row-preserving where training just drops the word)
    words.withColumn("tokens",
      when(col(wordCol).contains(S), lit(null))
        .otherwise(array_join(split(expr_sub(seg), SS), " ")))
  }

  // substring(seg, 2, length-2) over an arbitrary Column (expr() only
  // parses strings, so build the tree directly)
  private def expr_sub(seg: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    seg.substr(lit(2), length(seg) - 2)

  /** Token-budget accounting: per-document token counts under a
    * tokenizer LEARNED from the same corpus — the number every
    * training-data pipeline sizes its mixtures and packing by.
    *
    * Scale shape: the corpus tokenizes through its VOCABULARY — the
    * distinct-word table is encoded once (`rounds` replaces over
    * Zipf-many rows, not corpus-many), then each document's count is a
    * word→n_tokens join + sum. The join key is the word; at real scale
    * the vocabulary side is orders of magnitude smaller than the token
    * stream and broadcast-eligible. Documents whose text yields no
    * countable words report (0, 0), not absence. Output:
    * (id, n_words, n_tokens).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int): DataFrame = {
    val merges = trainMerges(docs, textCol, rounds)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val words = docs
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0 && !col("word").contains(S))
    val vocab = encodeWords(words.select("word").distinct(), "word", merges)
      .select(col("word"),
        size(split(col("tokens"), " ")).cast("long").as("n_tok"))
    val counted = words.join(vocab, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
    docs.select(col(idCol)).distinct()
      .join(counted, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
  }
}
