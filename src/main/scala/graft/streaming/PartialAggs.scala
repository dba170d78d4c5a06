package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming aggregation through a LAKE of per-batch partial aggregates —
  * the production shape of "fold a stream into a table you can query".
  *
  * Each micro-batch is reduced to one mergeable partial-aggregate row per
  * group (count / sum / min / max — the algebras where
  * stream-of-batches == one batch) and written to
  * `partialsDir/batch_id=<id>/` as parquet; the read side re-merges with
  * the dual aggregate (sum of counts, sum of sums, min of mins, max of
  * maxes). Nothing ever accumulates on the driver and no state store
  * grows with key cardinality: state lives in the lake, sized
  * O(batches · groups-per-batch), and the merge is an ordinary
  * distributed aggregation any engine can run at read time.
  *
  * Exactly-once without sink transactions: `foreachBatch` may REPLAY a
  * batch after a crash (the checkpoint commits the offset only after the
  * batch function returns), so an append-mode sink would double-count
  * the replayed batch. Writing each batch to its own `batch_id=` leaf
  * with Overwrite makes the replay idempotent — the second attempt
  * replaces the first attempt's files byte-for-byte (the batch's input
  * file set is pinned by the checkpoint, the aggregation is
  * deterministic), which is exactly the contract Structured Streaming
  * asks of a foreachBatch sink. The leaf directory doubles as a lake
  * partition, so per-batch audit ("which batch contributed what") is a
  * partition-pruned scan.
  *
  * At 100 TB scale the partials lake eventually wants the same
  * maintenance as any append-heavy table — periodic re-merge of old
  * `batch_id=` leaves into one consolidated leaf
  * ([[graft.sinks.Lake.compact]] is that pass); the read-side merge is
  * indifferent to how many leaves the same mass is spread over.
  */
object PartialAggs {

  /** Mergeable aggregate spec: `count` aliases plus (column → alias)
    * pairs per algebra. Every alias must be unique; keys pass through.
    */
  final case class Spec(
      keys: Seq[String],
      countAs: Option[String] = None,
      sums: Seq[(String, String)] = Nil,
      mins: Seq[(String, String)] = Nil,
      maxes: Seq[(String, String)] = Nil) {
    require(keys.nonEmpty, "at least one group key")
    private[streaming] def aliases: Seq[String] =
      countAs.toSeq ++ (sums ++ mins ++ maxes).map(_._2)
    require(aliases.distinct.size == aliases.size,
      s"aggregate aliases must be unique: $aliases")
    require(aliases.nonEmpty, "at least one aggregate")

    /** The per-batch partial: one row per group of `df`. */
    private[streaming] def partial(df: DataFrame): DataFrame = {
      val aggs =
        countAs.map(a => count(lit(1)).as(a)).toSeq ++
          sums.map { case (c, a) => sum(col(c)).as(a) } ++
          mins.map { case (c, a) => min(col(c)).as(a) } ++
          maxes.map { case (c, a) => max(col(c)).as(a) }
      df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }

    /** The dual merge over a frame of partials (count merges by SUM). */
    private[streaming] def merge(partials: DataFrame): DataFrame = {
      val aggs =
        countAs.map(a => sum(col(a)).as(a)).toSeq ++
          sums.map { case (_, a) => sum(col(a)).as(a) } ++
          mins.map { case (_, a) => min(col(a)).as(a) } ++
          maxes.map { case (_, a) => max(col(a)).as(a) }
      partials.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Drains `stream` (Trigger.AvailableNow) into the partials lake at
    * `partialsDir` under `spec`, one idempotent `batch_id=` leaf per
    * micro-batch. Returns the number of batches written this run.
    */
  def writePartials(stream: DataFrame, spec: Spec, partialsDir: String,
      checkpointDir: String = null): Long = {
    // The checkpoint and the lake are ONE unit of state: batch ids and
    // their leaves only line up against the checkpoint that produced
    // them. A checkpoint with no committed offsets (null, or a fresh
    // directory) restarts from batch 0 and reprocesses everything — any
    // leaves a previous run left behind must go first, or the re-run's
    // batch 0 would overwrite only leaf 0 and readMerged would
    // double-count the stale remainder. A checkpoint WITH state resumes
    // exactly where it left off, so its leaves are kept.
    val checkpoint =
      if (checkpointDir != null) checkpointDir
      else java.nio.file.Files.createTempDirectory("partials_ckpt").toString
    // probe + cleanup via the Hadoop FileSystem API ([[StreamFs]]), so
    // the contract holds on HDFS/S3 — java.nio sees no directory there
    // and would silently keep the stale leaves readMerged double-counts
    val spark = stream.sparkSession
    if (!StreamFs.hasCommittedOffsets(spark, checkpoint))
      StreamFs.clearBatchLeaves(spark, partialsDir)
    val batches = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Overwrite of the batch's own leaf = replay-idempotent append
        spec.partial(batch).write.mode("overwrite")
          .parquet(s"$partialsDir/batch_id=$batchId")
        batches.incrementAndGet(): Unit
      }
      .start()
    try q.awaitTermination() finally q.stop()
    batches.get()
  }

  /** The merged view of a partials lake: exactly what one batch
    * aggregation over the full input would have produced. `batch_id` is
    * recovered from the directory layout and dropped before the merge.
    */
  def readMerged(spark: SparkSession, spec: Spec,
      partialsDir: String): DataFrame =
    spec.merge(spark.read.option("basePath", partialsDir)
      .parquet(partialsDir).drop("batch_id"))

  /** Lake maintenance: consolidate old `batch_id=` leaves into ONE
    * merged leaf. The partials are mergeable by construction, so the
    * absorbed leaves' rows collapse to `spec.merge` of themselves and
    * [[readMerged]] is INVARIANT across the pass (spec-pinned) — the
    * same property that makes the read-side merge correct makes
    * compaction a pure re-layout. Leaf count drops from B to
    * `keepLast + 1`; at 100 TB this is what keeps an always-appending
    * partials lake from accumulating unbounded small files
    * (file-level compaction inside leaves is [[graft.sinks.Lake.compact]];
    * this pass removes the leaves themselves).
    *
    * The newest `keepLast` leaves are never absorbed: only a batch
    * whose offset was not yet committed can REPLAY (foreachBatch
    * overwrite-the-leaf idempotence), and that can only be the most
    * recent one — absorbing it would let a replay overwrite the
    * consolidated mass. The consolidated leaf takes the SMALLEST
    * absorbed batch id (a committed batch never replays, so nothing
    * ever overwrites it). Run with the stream quiescent, like any
    * table-maintenance pass.
    *
    * Crash safety — a MANIFEST commit protocol, so every crash window
    * resolves to exactly one of "the pass never happened" or "the pass
    * completes on recovery", with no double-count and no loss:
    *
    *  1. the merged mass is written to a sibling `.compact_tmp`;
    *  2. the absorbed leaf ids are then committed ATOMICALLY as
    *     `tmp/_ABSORBED` (written to a side name, renamed into place —
    *     rename is the atomic primitive directory lakes actually have).
    *     The manifest is the commit point: before it exists nothing has
    *     been deleted and tmp is disposable; after it exists the pass
    *     is decided and recovery completes it;
    *  3. the absorbed leaves are deleted;
    *  4. tmp is renamed to `batch_id=<min absorbed id>` (a committed
    *     batch never replays, so nothing ever overwrites it).
    *
    * Recovery (run FIRST by every pass): a leftover tmp WITHOUT a
    * manifest is a mid-write corpse — every source leaf is still
    * intact, so tmp is deleted and the pass recompacts from the leaves
    * (a partial parquet directory must never be promoted). A tmp WITH
    * a manifest holds the complete merged mass of the listed leaves —
    * recovery deletes any listed leaf still present (the predecessor
    * may have died between commit and deletes — promoting without this
    * would count the absorbed mass twice) and then promotes tmp to its
    * destination leaf, finishing the crashed pass exactly. Every step
    * is idempotent, so a crash during recovery recovers the same way.
    *
    * Returns (leaves before, leaves after) — `before` counts the lake
    * after recovery, i.e. as a crash-free predecessor would have left
    * it.
    */
  def compactPartials(spark: SparkSession, spec: Spec, partialsDir: String,
      keepLast: Int = 1): (Long, Long) = {
    require(keepLast >= 0, s"keepLast=$keepLast must be >= 0")
    import org.apache.hadoop.fs.Path
    val base = new Path(partialsDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafIds(): Seq[Long] =
      (if (fs.exists(base)) fs.listStatus(base).toSeq else Nil)
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("batch_id="))
        .flatMap(s => // tolerate foreign dirs (metadata, partial writes)
          s.getPath.getName.stripPrefix("batch_id=").toLongOption)
        .sorted
    val tmp = new Path(partialsDir + ".compact_tmp")
    val manifest = new Path(tmp, ManifestName)
    // delete the listed leaves (idempotent) and rename tmp into the
    // smallest absorbed id's leaf — steps 3+4, shared with recovery.
    // The manifest rides along inside the promoted leaf until the final
    // best-effort cleanup; `_`-prefixed files are invisible to parquet
    // reads, so a crash before that cleanup leaves an inert marker, not
    // a recovery trigger (recovery only looks inside tmp).
    def promote(ids: Seq[Long]): Unit = {
      ids.foreach(id =>
        fs.delete(new Path(s"$partialsDir/batch_id=$id"), true))
      val dest = new Path(s"$partialsDir/batch_id=${ids.min}")
      require(fs.rename(tmp, dest),
        s"compactPartials: rename $tmp -> $dest failed; the merged mass " +
          "is intact in the tmp dir — re-run the pass")
      fs.delete(new Path(dest, ManifestName), false): Unit
    }
    if (fs.exists(tmp)) {
      if (fs.exists(manifest)) promote(readManifest(fs, manifest))
      else require(fs.delete(tmp, true),
        s"compactPartials: could not discard uncommitted tmp $tmp")
    }
    val before = leafIds()
    val absorb = before.dropRight(keepLast)
    if (absorb.size < 2) return (before.size.toLong, before.size.toLong)
    val absorbed = spark.read.parquet(
      absorb.map(id => s"$partialsDir/batch_id=$id"): _*)
    // one merged leaf: the dual aggregate over the absorbed partials IS
    // a valid partial for the same mass (associativity of the algebras)
    spec.merge(absorbed).write.mode("overwrite").parquet(tmp.toString)
    writeManifest(fs, tmp, absorb) // the commit point
    promote(absorb)
    (before.size.toLong, leafIds().size.toLong)
  }

  private[graft] val ManifestName = "_ABSORBED"

  /** Commit the absorbed-ids manifest: write to a side name, rename into
    * place — the marker either exists complete or not at all.
    */
  private[graft] def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path, ids: Seq[Long]): Unit = {
    val side = new org.apache.hadoop.fs.Path(tmp, ManifestName + ".writing")
    val out = fs.create(side, true)
    try out.write(ids.mkString("\n").getBytes("UTF-8")) finally out.close()
    val dst = new org.apache.hadoop.fs.Path(tmp, ManifestName)
    require(fs.rename(side, dst),
      s"compactPartials: manifest commit $side -> $dst failed")
  }

  private[graft] def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      manifest: org.apache.hadoop.fs.Path): Seq[Long] = {
    val in = fs.open(manifest)
    val text =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val ids = text.split("\n").toSeq.filter(_.nonEmpty).map(_.toLong)
    require(ids.nonEmpty, s"compactPartials: empty manifest $manifest")
    ids
  }
}
