package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup

/** Streaming NEAR-duplicate detection — the micro-batch shape of
  * [[graft.operators.Dedup.incrementalNearDups]]: new documents arrive
  * as a stream, and each micro-batch is matched against a PERSISTED
  * corpus LSH state (MinHash signatures + shingle-hash sets, written
  * once per corpus vintage by [[writeCorpusState]]).
  *
  * This closes the gap between the streaming surface (exact-key dedup
  * via dropDuplicates, [[DedupStream]]) and the batch incremental path
  * (delta-vs-corpus MinHash, q69): ingestion pipelines see fresh crawl
  * pages continuously and want "is this a near-copy of something we
  * already hold?" per arrival, without re-running a corpus×corpus job.
  *
  * Scale shape (100 TB): the corpus state is computed ONCE (the
  * signature lake — ~1-2% of corpus bytes) and every micro-batch SCANS
  * it map-side against the batch's broadcast banded keys; the corpus is
  * never shuffled, candidates and verification joins are batch-sized,
  * and per-batch pair results land in their own `batch_id=` leaf with
  * Overwrite — the [[PartialAggs]] replay-idempotence discipline
  * (foreachBatch may replay a batch after a crash; overwriting the
  * batch's own leaf makes the second attempt replace the first
  * byte-for-byte). Near-dup pair emission is per-delta-doc independent,
  * so batch boundaries cannot change the result: the union of leaves
  * EQUALS the one-shot batch operator over the same delta (q163 pins
  * the equality under q69's oracle).
  */
object NearDupStream {

  /** Compute and persist the corpus LSH state ([[Dedup.nearDupState]]'s
    * (corpus_id, corpus_hset, corpus_sig) schema) as parquet — the
    * once-per-vintage preparation every micro-batch reads.
    */
  def writeCorpusState(corpus: DataFrame, idCol: String, textCol: String,
      stateDir: String, shingleN: Int = 3, k: Int = 32): Unit =
    Dedup.nearDupState(corpus, idCol, textCol, shingleN, k)
      .write.mode("overwrite").parquet(stateDir)

  /** Retrain-free append to a persisted corpus LSH state — the
    * incremental-refresh maintenance op pairing with [[writeCorpusState]]
    * the way [[graft.operators.Similarity.appendToIvfLake]] pairs with
    * its lake write: ACCEPTED documents (fresh crawl pages that cleared
    * dedup) join the state without a vintage rebuild, so a long-running
    * ingest can fold its own survivors back in and stop drifting stale
    * between vintages. Signatures/shingle sets are computed for the new
    * docs only and appended; existing state files are never touched, and
    * matching against state+append EQUALS matching against a full
    * rebuild over the same corpus (q172 pins it under q69's all-pairs
    * oracle) because [[graft.operators.Dedup.nearDupState]] is a pure
    * per-row transform — there is no trained geometry to drift.
    *
    * `k` is verified against the persisted signature width (a mismatch
    * would silently never band-match); `shingleN` is NOT detectable from
    * the state — the caller owns that contract, as with every
    * hash-parameterized sketch. Appending the same doc twice duplicates
    * its state rows (both copies band identically, so correctness
    * degrades only to duplicate pair emissions) — feed this op each
    * accepted batch once, e.g. from an idempotent `batch_id=` leaf.
    */
  def appendToCorpusState(accepted: DataFrame, idCol: String,
      textCol: String, stateDir: String, shingleN: Int = 3,
      k: Int = 32): Unit = {
    val spark = accepted.sparkSession
    val width = spark.read.parquet(stateDir)
      .select(size(col("corpus_sig"))).limit(1).collect()
    width.headOption.foreach { r =>
      require(r.getInt(0) == k,
        s"$stateDir signatures are ${r.getInt(0)}-wide, caller said k=$k")
    }
    Dedup.nearDupState(accepted, idCol, textCol, shingleN, k)
      .write.mode("append").parquet(stateDir)
  }

  /** Synchronize a persisted corpus LSH state from a versioned lake's
    * CHANGE FEED ([[graft.sinks.VersionedLake.changesBetween]]'s typed
    * rows) — the derived-state maintenance loop a 100 TB deployment
    * actually runs: the document lake mutates through commits (appends,
    * MERGEs, takedowns), and instead of rebuilding the signature state
    * per vintage OR reverse-engineering what changed, the state
    * consumes the feed: departures (`delete` + `update_preimage`) leave
    * by id through [[Dedup.deleteFromNearDupState]]'s swap-protected
    * rewrite, then arrivals (`insert` + `update_postimage`) append
    * through [[appendToCorpusState]]'s retrain-free discipline. Cost is
    * the CHURN (the feed is churn-sized by construction), never the
    * corpus; the result is row-identical to a rebuild over the lake's
    * new membership because the state is a pure per-row transform.
    *
    * Ordering matters and is owned here: departures FIRST, so an
    * updated document's stale signature can never survive next to its
    * replacement. Apply each feed span exactly once (the
    * [[appendToCorpusState]] contract) — a replayed span would
    * duplicate arrival signatures. Returns (nDeparted, nArrived) in
    * documents.
    */
  def applyChangesToCorpusState(changes: DataFrame, idCol: String,
      textCol: String, stateDir: String, shingleN: Int = 3,
      k: Int = 32): (Long, Long) = {
    val spark = changes.sparkSession
    // the feed is churn-sized but feeds two actions — evaluate it once
    val c = changes.persist()
    try {
      val departures = c
        .filter(col("change_type").isin("delete", "update_preimage"))
        .select(col(idCol))
      val arrivals = c
        .filter(col("change_type").isin("insert", "update_postimage"))
        .select(col(idCol), col(textCol))
      val departed =
        Dedup.deleteFromNearDupState(spark, stateDir, departures)
      val arrived = arrivals.count()
      if (arrived > 0L)
        appendToCorpusState(arrivals, idCol, textCol, stateDir,
          shingleN, k)
      (departed, arrived)
    } finally { c.unpersist(blocking = false): Unit }
  }

  /** Name of the version-cursor file a lake-paired state carries — a
    * plain text file INSIDE the state dir (the `_` prefix keeps it out
    * of Spark's parquet listing), so the atomic dir swap that promotes
    * a synced state promotes its cursor in the same rename.
    */
  private val CursorName = "_synced_version"

  private def readCursor(spark: SparkSession,
      stateDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(stateDir, CursorName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
      finally in.close()
      s.toLongOption
    }
  }

  private def writeCursor(spark: SparkSession, dir: String,
      v: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, CursorName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Build the corpus LSH state FROM a versioned document lake and pair
    * them: the state remembers which lake version it reflects (a cursor
    * file inside the state dir), so [[syncCorpusStateFromLake]] can
    * apply exactly the missing span — and only once. The lifecycle a
    * 100 TB deployment runs: build once, then sync after every batch of
    * lake commits.
    */
  def writeCorpusStateFromLake(spark: SparkSession, lakeDir: String,
      stateDir: String, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32): Long = {
    val v = graft.sinks.VersionedLake.currentVersion(spark, lakeDir)
    require(v > 0, s"writeCorpusStateFromLake on an empty lake at $lakeDir")
    writeCorpusState(graft.sinks.VersionedLake.read(spark, lakeDir),
      idCol, textCol, stateDir, shingleN, k)
    writeCursor(spark, stateDir, v)
    v
  }

  /** Bring a lake-paired corpus state up to the lake's current version
    * — [[applyChangesToCorpusState]] with the exactly-once contract
    * OWNED HERE instead of by the caller: the state's cursor says which
    * version it reflects, the missing span's change feed is derived and
    * applied into a SIDE-NAME rewrite (base state minus departures,
    * plus arrivals' fresh signatures), and the new state is promoted by
    * the atomic dir swap WITH its advanced cursor inside — "state
    * updated" and "span applied" are one rename, so a crash anywhere
    * leaves either the old state+cursor (retry re-derives the same
    * span) or the new pair (retry is a no-op). Nothing can be applied
    * twice, and nothing can be skipped.
    *
    * Cost honesty: unlike the churn-proportional raw apply, the
    * promote rewrites the STATE (signatures, ~1-2% of corpus bytes) —
    * the same cost class as [[graft.operators.Dedup.deleteFromNearDupState]]'s
    * swap, paid for the atomicity. Callers managing exactly-once
    * themselves (e.g. one feed span per streaming batch id) can keep
    * the raw apply. Returns (fromVersion, toVersion, nChangeRows);
    * a state already at the lake's version returns without reading
    * anything but the cursor.
    */
  def syncCorpusStateFromLake(spark: SparkSession, lakeDir: String,
      stateDir: String, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 32): (Long, Long, Long) = {
    import org.apache.hadoop.fs.Path
    val live = new Path(stateDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a previous sync killed between the swap's two renames parked the
    // state at the backup name — restore before reading
    graft.sinks.Lake.recoverSwap(fs, live,
      new Path(stateDir + ".sync_backup"))
    val synced = readCursor(spark, stateDir).getOrElse(
      throw new IllegalArgumentException(s"state at $stateDir carries " +
        "no version cursor — build it with writeCorpusStateFromLake"))
    val cur = graft.sinks.VersionedLake.currentVersion(spark, lakeDir)
    require(cur >= synced,
      s"state at $stateDir reflects lake version $synced but $lakeDir " +
        s"is at $cur — this state does not belong to this lake")
    if (cur == synced) return (synced, cur, 0L)
    // schemaHint covers the shares-every-file span (e.g. a RESTORE back
    // to exactly the synced version) — an empty typed feed, not a throw
    val hint = scala.util.Try(
      graft.sinks.VersionedLake.read(spark, lakeDir).schema).toOption
    val feed = graft.sinks.VersionedLake
      .changesBetween(spark, lakeDir, synced, cur, idCol, hint).persist()
    try {
      val nChanges = feed.count()
      val departures = feed
        .filter(col("change_type").isin("delete", "update_preimage"))
        .select(col(idCol).as("corpus_id")).distinct()
      val arrivals = feed
        .filter(col("change_type").isin("insert", "update_postimage"))
        .select(col(idCol), col(textCol))
      val tmp = stateDir + ".sync_tmp"
      spark.read.parquet(stateDir)
        .join(departures, Seq("corpus_id"), "left_anti")
        .unionByName(Dedup.nearDupState(arrivals, idCol, textCol,
          shingleN, k))
        .write.mode("overwrite").parquet(tmp)
      writeCursor(spark, tmp, cur) // rides the promote rename
      graft.sinks.Lake.swapDirs(fs, live, new Path(tmp),
        new Path(stateDir + ".sync_backup"))
      (synced, cur, nChanges)
    } finally { feed.unpersist(blocking = false): Unit }
  }

  /** Drain `deltaStream` (Trigger.AvailableNow) against the state at
    * `stateDir`, writing each micro-batch's near-dup pairs to
    * `outDir/batch_id=<id>/` (idempotent overwrite), and return the
    * merged (corpus_id, delta_id, jaccard) view. `shingleN`/`k` must
    * match [[writeCorpusState]]'s. A fresh/empty checkpoint restarts
    * from batch 0, so stale leaves from a previous run are cleared
    * first — the [[PartialAggs.writePartials]] rule: the checkpoint and
    * the lake are one unit of state.
    */
  def nearDupPairs(spark: SparkSession, deltaStream: DataFrame,
      idCol: String, textCol: String, stateDir: String, outDir: String,
      checkpointDir: String = null, shingleN: Int = 3, k: Int = 32,
      bands: Int = 8, threshold: Double = 0.5): DataFrame = {
    val checkpoint =
      if (checkpointDir != null) checkpointDir
      else java.nio.file.Files.createTempDirectory("neardup_ckpt").toString
    // probe + cleanup resolve through the Hadoop FileSystem API, so the
    // checkpoint-and-lake-are-one-unit contract holds on HDFS/S3 too —
    // java.nio would silently see no directory there and keep a dead
    // run's leaves for the merged read to double-count
    if (!StreamFs.hasCommittedOffsets(spark, checkpoint))
      StreamFs.clearBatchLeaves(spark, outDir)
    val state = spark.read.parquet(stateDir)
    val q = deltaStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // nearDupsAgainstState persists the batch's prepped projection
        // (it feeds banding + verification); on a CONTINUOUS deployment
        // those per-batch persists would accumulate for the life of the
        // stream, so each batch releases exactly what it created —
        // never a cache some other operator (or the session) holds
        val before = spark.sparkContext.getPersistentRDDs.keySet
        Dedup.nearDupsAgainstState(state, batch, idCol, textCol,
            shingleN, k, bands, threshold)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) => !before.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
      .start()
    try q.awaitTermination() finally q.stop()
    // an EMPTY drained delta writes no leaves — return an empty frame
    // with the contract schema, never a "path does not exist" failure
    if (!StreamFs.hasBatchLeaves(spark, outDir)) {
      import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
      val schema = StructType(Seq(
        StructField("corpus_id", state.schema("corpus_id").dataType),
        StructField("delta_id", deltaStream.schema(idCol).dataType),
        StructField("jaccard", DoubleType)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else
      spark.read.option("basePath", outDir).parquet(outDir)
        .select(col("corpus_id"), col("delta_id"), col("jaccard"))
  }
}
