package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-partitioned parquet lake export — the layout a training-data
  * corpus actually ships in: one directory per partition value, so
  * downstream consumers (mixture sampling per language/source, per-shard
  * training jobs) read only the partitions they ask for. At 100 TB the
  * load-bearing property is partition PRUNING: a `lang = 'en'` filter on
  * the read side becomes a directory listing, not a 100 TB scan —
  * `PlanSpec` pins the `PartitionFilters` evidence.
  *
  * Reference analogue: the TSV export directory of `ElasticSearch
  * ETL.py:247` is the flat single-consumer version of this; the
  * partitioned form is its many-consumer, scale-safe successor.
  */
object Lake {

  /** Write `df` partitioned by `partCol` (hive layout `partCol=value/`). */
  def writePartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(dir)

  /** Read a partitioned lake back (partition column recovered from the
    * directory layout; filters on it prune at file-listing time).
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Concrete parquet part files of a `_`-prefixed sidecar dir, listed
    * through the Hadoop FS. Naming the underscore DIR as a read root
    * trips DataSource's "All paths were ignored" WARN (and a glob trips
    * FileStreamSink's metadata probe) — [error]-tagged noise in every
    * scored bench log; explicit `part-*.parquet` file paths are clean.
    * Callers supply the schema: an empty list reads as an empty frame.
    */
  private[graft] def sidecarParquetFiles(spark: SparkSession,
      dir: String): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-") &&
        f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq
  }

  /** Point-lookup-optimized lake for an id-keyed corpus (the ANN refine
    * scan's storage contract — `Similarity.pqTopKOverLake`): rows
    * range-partitioned AND sorted by `idCol`, so every parquet row
    * group covers a tight, disjoint id interval and the column index
    * (min/max) alone answers "which row groups can hold these ids";
    * per-row-group bloom filters on `idCol` catch the false positives
    * min/max ranges admit. An id-list filter on the read side then
    * touches only the row groups the ids actually live in — at 100 TB
    * the refine scan reads O(|shortlist|) row groups, not the corpus.
    * `rowGroupBytes` bounds the pruning granule (parquet.block.size).
    */
  def writeAnnLake(df: DataFrame, dir: String, idCol: String,
      nFiles: Int = 8, rowGroupBytes: Long = 1L << 20): Unit =
    df.repartitionByRange(nFiles, col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$idCol", "true")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(dir)

  /** Per-lake parquet file census via the Hadoop FileSystem API (works
    * on the local FS here and on HDFS/object stores on a cluster).
    */
  def fileStats(spark: SparkSession, dir: String): (Long, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var files = 0L
    var bytes = 0L
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        files += 1; bytes += f.getLen
      }
    }
    (files, bytes)
  }

  /** Parquet bytes per top-level `partCol=value` directory, keyed by the
    * UNESCAPED partition value (hive escapes specials as %XX in dir
    * names). One map entry per distinct partition value — the same small
    * cardinality the hive layout itself already commits to.
    */
  private def partitionBytes(fs: FileSystem, path: Path,
      partCol: String): Map[String, Long] = {
    val prefix = partCol + "="
    fs.listStatus(path).iterator
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map { s =>
        var bytes = 0L
        val it = fs.listFiles(s.getPath, true)
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
        }
        unescapePathName(s.getPath.getName.drop(prefix.length)) -> bytes
      }.toMap
  }

  /** Inverse of hive's %XX path escaping (space, '/', ':' … in partition
    * values), so census keys compare equal to the column values Spark
    * reconstructs on read.
    */
  private def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Takedown / right-to-erasure deletion from a hive-partitioned lake —
    * the maintenance op every production training corpus eventually
    * fields: remove a set of document ids so they stop existing for
    * every later reader, WITHOUT rewriting the lake. Cost is
    * proportional to the AFFECTED partitions: the id→partition mapping
    * is one column-pruned scan (id + the partition value the directory
    * layout supplies — document bodies and embeddings are never read),
    * and only partitions that actually hold a deleted id are rewritten;
    * a 100 TB lake with deletions confined to one crawl slice rewrites
    * that slice. Underscore-prefixed sidecar dirs (`_ivf_centroids`,
    * `_pq_codebooks`) are untouched, so ANN-lake geometry survives —
    * [[graft.operators.Similarity.deleteFromIvfLake]] is this op on a
    * `cell=`-partitioned lake.
    *
    * Crash safety is the manifest commit protocol shared with
    * [[graft.streaming.PartialAggs.compactPartials]] /
    * [[graft.operators.Similarity.compactIvfLake]], generalized to
    * string partition values (the manifest lists leaf DIRECTORY NAMES):
    *  1. affected partitions are rewritten minus the ids into a sibling
    *     `.takedown_tmp` (a partition whose every row is deleted gets an
    *     explicit EMPTY replacement dir, so promotion is uniform and a
    *     recovery can tell "fully deleted" from "already promoted");
    *  2. the affected leaf names commit atomically as the tmp's
    *     `_ABSORBED` manifest — before it exists nothing was deleted and
    *     tmp is disposable; after, recovery completes the pass;
    *  3. each listed live leaf is deleted and its replacement renamed in
    *     (idempotent per leaf: a replacement no longer in tmp was
    *     already promoted and is skipped);
    *  4. tmp is removed.
    *
    * `ids`' FIRST column is the id set (deduplicated here); `idCol`
    * names the lake's id column. Partition values must be non-NULL and
    * of a type whose Scala `toString` matches hive's directory encoding
    * (string/integral — the lakes this engine writes); a NULL-partition
    * match fails loudly rather than silently surviving a takedown.
    * Returns (partitions rewritten, rows removed).
    */
  def deleteIds(spark: SparkSession, dir: String, partCol: String,
      idCol: String, ids: DataFrame): (Long, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + ".takedown_tmp")
    def promote(leafNames: Seq[String]): Unit =
      promoteLeaves(fs, path, tmp, leafNames)
    recoverLeafCommit(fs, path, tmp)
    // the id set feeds the affected-partition scan AND the rewrite
    // anti-join — persist once (delete-request-sized) instead of
    // re-executing the caller's plan per consumer (the
    // VersionedLake.commitDelete discipline)
    val dels = ids.select(col(ids.columns.head).as(idCol)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lake = read(spark, dir)
      // bounded: one row per AFFECTED partition value (id + partition
      // column only — the partition value comes from the directory
      // layout, so no data column beyond the id is ever decoded)
      val affected = lake.select(col(idCol), col(partCol))
        .join(dels, Seq(idCol))
        .groupBy(col(partCol)).agg(count(lit(1)).as("n"))
        .collect()
      if (affected.isEmpty) return (0L, 0L)
      require(affected.forall(!_.isNullAt(0)),
        s"deleteIds: deleted ids found under a NULL $partCol partition — " +
          "unsupported layout; re-key the lake before takedown")
      val removed = affected.map(_.getLong(1)).sum
      val affectedStr = affected.map(_.get(0).toString).toSet
      val prefix = partCol + "="
      val affectedNames = fs.listStatus(path)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .map(_.getPath.getName)
        .filter(n =>
          affectedStr.contains(unescapePathName(n.drop(prefix.length))))
        .toSeq.sorted
      require(affectedNames.size == affectedStr.size,
        s"deleteIds: ${affectedStr.size} affected partition values but " +
          s"${affectedNames.size} matching leaf dirs under $dir — " +
          "partition value encoding mismatch; aborting before any delete")
      val affectedVals = affected.map(_.get(0)).toSeq
      lake.filter(col(partCol).isin(affectedVals: _*))
        .join(dels, Seq(idCol), "left_anti")
        .repartition(col(partCol))
        .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
      // fully-deleted partitions produced no tmp leaf: give them an
      // explicit empty replacement so promote/recovery stay uniform
      affectedNames.foreach { name =>
        val leaf = new Path(tmp, name)
        if (!fs.exists(leaf)) require(fs.mkdirs(leaf),
          s"deleteIds: could not create empty replacement $leaf")
      }
      writeNameManifest(fs, tmp, affectedNames) // the commit point
      promote(affectedNames)
      (affectedNames.size.toLong, removed)
    } finally dels.unpersist(blocking = false): Unit
  }

  /** Promote a committed leaf-rewrite: each listed name under `tmp`
    * replaces its sibling under `base` (idempotent per leaf — a name no
    * longer in tmp was already promoted by a dead pass and is skipped),
    * then tmp is removed. Works for leaf DIRECTORIES and plain files
    * (marker files) alike; only ever call with the manifest's names.
    */
  private[graft] def promoteLeaves(fs: FileSystem, base: Path, tmp: Path,
      names: Seq[String]): Unit = {
    names.foreach { name =>
      val src = new Path(tmp, name)
      if (fs.exists(src)) { // absent = already promoted by a dead pass
        fs.delete(new Path(base, name), true)
        require(fs.rename(src, new Path(base, name)),
          s"leaf commit: rename $src failed; the rewritten leaf is " +
            "intact in the tmp dir — re-run the pass")
      }
    }
    require(fs.delete(tmp, true),
      s"leaf commit: could not remove committed tmp $tmp")
  }

  /** Recovery half of the leaf-rewrite protocol — call BEFORE starting a
    * new rewrite of `base`: a committed tmp (manifest present) rolls
    * FORWARD (its listed leaves promote), an uncommitted tmp is
    * discarded (nothing was published, so it is disposable).
    */
  private[graft] def recoverLeafCommit(fs: FileSystem, base: Path,
      tmp: Path): Unit =
    if (fs.exists(tmp)) {
      val manifest = new Path(tmp, graft.streaming.PartialAggs.ManifestName)
      if (fs.exists(manifest))
        promoteLeaves(fs, base, tmp, readNameManifest(fs, manifest))
      else require(fs.delete(tmp, true),
        s"leaf commit: could not discard uncommitted tmp $tmp")
    }

  /** String-leaf-name manifest commit (side name + rename, the
    * [[graft.streaming.PartialAggs.writeManifest]] discipline
    * generalized beyond long ids).
    */
  private[graft] def writeNameManifest(fs: FileSystem, tmp: Path,
      names: Seq[String]): Unit = {
    val side = new Path(tmp, graft.streaming.PartialAggs.ManifestName + ".writing")
    val out = fs.create(side, true)
    try out.write(names.mkString("\n").getBytes("UTF-8")) finally out.close()
    val dst = new Path(tmp, graft.streaming.PartialAggs.ManifestName)
    require(fs.rename(side, dst),
      s"deleteIds: manifest commit $side -> $dst failed")
  }

  private[graft] def readNameManifest(fs: FileSystem,
      manifest: Path): Seq[String] = {
    val in = fs.open(manifest)
    val text =
      try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    val names = text.split("\n").toSeq.filter(_.nonEmpty)
    require(names.nonEmpty, s"deleteIds: empty manifest $manifest")
    names
  }

  /** Small-file compaction — the lake-maintenance pass every long-lived
    * training corpus needs: incremental ingestion (one micro-batch or
    * CDC merge per arrival) strews thousands of KB-sized parquet files
    * per partition, and at 100 TB the resulting file-listing and
    * per-file open costs dominate reads long before the bytes do.
    *
    * Parallelism is derived from the per-partition byte census, not the
    * partition-value cardinality: each `partCol` value gets
    * `ceil(partitionBytes / targetFileBytes)` hash slices and rows are
    * repartitioned on `(partCol, slice)`, so a HOT partition (most
    * corpora are majority-one-language) compacts in parallel across its
    * slices into ~`targetFileBytes` files instead of serializing through
    * one straggler task that writes one oversized file. Slice→task
    * assignment is by hash, so an output task can carry a small number
    * of slices (file sizes are ~targetFileBytes up to a small constant),
    * which is the right trade at scale: the alternative, range
    * repartitioning, buys exact slice placement at the cost of a second
    * full read of the lake for boundary sampling.
    *
    * The directory swap uses RENAMES ONLY — live → `.compact_backup`,
    * tmp → live, then the backup is deleted — so a crash or rename
    * failure at ANY step leaves a complete copy of the data on disk
    * (readable at `dir`, or recoverable at `dir + ".compact_backup"`);
    * nothing is deleted until the new layout is live. What this does NOT
    * give is atomic visibility: between the two renames a reader can
    * observe a missing directory for an instant (rename itself is atomic
    * on HDFS/local posix FS, but no filesystem makes two renames one
    * transaction, and object stores implement rename as copy — a
    * production object-store lake wants a manifest/table format for
    * that). Content is byte-invariant through the rewrite: the q106
    * oracle replays the aggregate from the source table, so a row lost
    * or duplicated by the rewrite fails the hash.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, dir: String, partCol: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path, new Path(dir + ".compact_backup"))
    val (before, _) = fileStats(spark, dir)
    val slices: Map[String, Int] = partitionBytes(fs, path, partCol)
      .map { case (v, b) =>
        v -> math.max(1L, (b + targetFileBytes - 1) / targetFileBytes).toInt
      }
    val nTasks = math.max(1L, slices.values.map(_.toLong).sum)
      .min(Int.MaxValue).toInt
    val src = read(spark, dir)
    val dataCols = src.columns.filterNot(_ == partCol).map(col).toSeq
    // deterministic row salt in [0, slices(partValue)): partition values
    // absent from the census (concurrent writer, null partition) fall
    // back to one slice
    val salt = pmod(
      if (dataCols.nonEmpty) hash(dataCols: _*) else lit(0),
      coalesce(element_at(typedLit(slices), col(partCol).cast("string")),
        lit(1)))
    val tmp = dir + ".compact_tmp"
    src.withColumn("__slice", salt)
      .repartition(nTasks, col(partCol), col("__slice"))
      .drop("__slice")
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp)
    val tmpPath = new Path(tmp)
    try swapDirs(fs, path, tmpPath, new Path(dir + ".compact_backup"))
    catch { case e: Throwable => fs.delete(tmpPath, true); throw e }
    val (after, _) = fileStats(spark, dir)
    (before, after)
  }

  /** Recover a [[swapDirs]] that died between its two renames: the
    * live dir is missing and the original is parked whole at `backup` —
    * rename it back before any read or mutation proceeds. With live
    * present, a stale backup is left for swapDirs' own preamble to
    * clear. Call this at the top of every operation on a swap-protected
    * directory (the single-writer contract makes it race-free).
    */
  private[graft] def recoverSwap(fs: FileSystem, live: Path,
      backup: Path): Unit =
    if (!fs.exists(live) && fs.exists(backup))
      require(fs.rename(backup, live),
        s"swap recovery failed: $backup -> $live")

  /** Rename-only directory swap: live → backup, tmp → live, delete
    * backup. Invariant: a complete copy of the original data survives
    * every single-step failure — the original is never deleted until the
    * replacement is live. On a failed second rename the original is
    * restored from the backup before throwing; if even the restore
    * rename fails, the data still exists intact at `backup` (the error
    * says so). A hard crash between the renames parks the original at
    * `backup`; [[recoverSwap]] is the retry-side preamble that restores
    * it.
    */
  private[graft] def swapDirs(fs: FileSystem, live: Path, tmp: Path,
      backup: Path): Unit = {
    fs.delete(backup, true) // stale backup from a prior crashed run
    require(renameQuiet(fs, live, backup),
      s"compaction swap aborted: could not move $live aside; lake untouched")
    if (!renameQuiet(fs, tmp, live)) {
      val restored = renameQuiet(fs, backup, live)
      throw new IllegalStateException(
        if (restored)
          s"compaction swap failed: $tmp -> $live; original restored"
        else
          s"compaction swap failed AND restore failed: original data " +
            s"intact at $backup")
    }
    fs.delete(backup, true): Unit
  }

  /** `FileSystem.rename` signals failure as `false` or as an IOException
    * depending on the implementation — fold both into `false` so the
    * swap's restore logic sees every failure mode.
    */
  private def renameQuiet(fs: FileSystem, src: Path, dst: Path): Boolean =
    try fs.rename(src, dst)
    catch { case _: java.io.IOException => false }
}
