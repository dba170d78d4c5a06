package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet lake with time travel — the Iceberg/Delta snapshot
  * discipline reduced to its load-bearing core, on nothing but parquet
  * files and atomic renames (the same primitives every other manifest
  * protocol in this engine runs on, so it works wherever they do:
  * local FS, HDFS, and rename-capable object-store connectors).
  *
  * Layout:
  * {{{
  *   dir/data/c<version>/part-*.parquet   immutable — written by exactly
  *                                        one commit, NEVER rewritten
  *   dir/_versions/v<version>.txt         manifest: the relative data-file
  *                                        paths that ARE that version,
  *                                        one per line; the atomic rename
  *                                        that publishes it is the commit
  * }}}
  *
  * Why this shape at 100 TB:
  *   - Reads are MANIFEST-DRIVEN: [[readAsOf]] hands Spark the explicit
  *     file list, so no read ever lists `data/` — on S3-class stores,
  *     listing a 100k-file prefix per query is the dominant metadata
  *     cost and the thing Iceberg exists to remove.
  *   - A delete rewrites only the files that HOLD deleted ids (found by
  *     a column-pruned scan of the id column + `_metadata.file_path`);
  *     every other file is carried into the new manifest by name. Old
  *     files stay on disk, which is exactly what keeps prior versions
  *     readable — storage is reclaimed explicitly by [[vacuum]], never
  *     implicitly by a commit.
  *   - The manifest is a flat name list: ~100 bytes per file, a few MB
  *     at 100k files — driver-trivial. (Iceberg's manifest-of-manifests
  *     tree matters past ~10M files; out of scope here and noted.)
  *
  * Crash safety: data files land under `data/c<v>` BEFORE `v<v>.txt`
  * appears, so a crashed commit leaves only orphan files no manifest
  * references — invisible to every reader, reclaimed by [[vacuum]] or
  * overwritten by the retry (the retry recomputes the same version
  * number and rewrites `c<v>` whole). Publishing the manifest is one
  * rename; [[writeManifest]] refuses to replace an existing version, so
  * a second writer racing the same version fails loudly instead of
  * silently forking history — the single-writer-per-lake contract every
  * mutation protocol in this engine assumes.
  */
object VersionedLake {

  private val VersionsName = "_versions"
  private val DataName = "data"

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestPath(base: Path, v: Long): Path =
    new Path(base, f"$VersionsName/v$v%06d.txt")

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".txt"))
      name.stripPrefix("v").stripSuffix(".txt").toLongOption
    else None

  /** Highest committed version, 0 if the lake has none yet. */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val (fs, base) = fsOf(spark, dir)
    val vd = new Path(base, VersionsName)
    if (!fs.exists(vd)) 0L
    else fs.listStatus(vd).iterator
      .flatMap(s => versionOf(s.getPath.getName))
      .foldLeft(0L)(math.max)
  }

  /** Every committed version, ascending ([[vacuum]] may have dropped a
    * prefix).
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, base) = fsOf(spark, dir)
    val vd = new Path(base, VersionsName)
    if (!fs.exists(vd)) Seq.empty
    else fs.listStatus(vd).iterator
      .flatMap(s => versionOf(s.getPath.getName)).toSeq.sorted
  }

  private def manifestLines(fs: FileSystem, base: Path,
      v: Long): Seq[String] = {
    val p = manifestPath(base, v)
    require(fs.exists(p),
      s"no version $v at $base (missing ${p.getName} — vacuumed or never " +
        "committed)")
    val in = fs.open(p)
    val text =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** File ENTRIES of a manifest — the raw per-file lines, each either a
    * bare relative path or `path<TAB>min<TAB>max` when the lake carries
    * column statistics (see [[commitAppend]]'s `statsCol`). Bare-path
    * manifests from before stats were enabled parse unchanged.
    */
  private def fileEntries(fs: FileSystem, base: Path,
      v: Long): Seq[String] =
    manifestLines(fs, base, v).filterNot(_.startsWith("#"))

  private def entryPath(entry: String): String = entry.split('\t')(0)

  private def entryStats(entry: String): Option[(Long, Long)] = {
    val p = entry.split('\t')
    if (p.length == 3) for (lo <- p(1).toLongOption; hi <- p(2).toLongOption)
      yield (lo, hi)
    else None
  }

  private def readManifest(fs: FileSystem, base: Path,
      v: Long): Seq[String] =
    fileEntries(fs, base, v).map(entryPath)

  /** The streaming-batch provenance of a version, if it has one —
    * carried as a `#batch=<id>` header INSIDE the manifest so
    * "version committed" and "batch applied" are one rename.
    */
  private[sinks] def batchOf(fs: FileSystem, base: Path,
      v: Long): Option[Long] =
    manifestLines(fs, base, v).find(_.startsWith("#batch="))
      .flatMap(_.stripPrefix("#batch=").toLongOption)

  /** The lake's statistics column, if version `v` carries one —
    * `#stats=<col>` header, written by the commit that enabled stats
    * and propagated by every later commit.
    */
  def statsColOf(spark: SparkSession, dir: String, v: Long)
      : Option[String] = {
    val (fs, base) = fsOf(spark, dir)
    manifestLines(fs, base, v).find(_.startsWith("#stats="))
      .map(_.stripPrefix("#stats="))
  }

  /** Atomic commit: side-name write, then ONE rename. Refuses to replace
    * an existing version — two writers racing the same version number
    * must fail loudly, not fork history.
    */
  private[sinks] def writeManifest(fs: FileSystem, base: Path, v: Long,
      files: Seq[String], headers: Seq[String] = Nil): Unit = {
    val dst = manifestPath(base, v)
    require(!fs.exists(dst),
      s"version $v already committed at $base — concurrent writer?")
    val side = new Path(dst.getParent, dst.getName + ".writing")
    val out = fs.create(side, true)
    try out.write(((headers ++ files).mkString("\n") + "\n")
      .getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(side, dst), s"manifest commit $side -> $dst failed")
  }

  /** Per-file (min, max) of `statsCol` over THIS commit's new files —
    * one column-pruned read of exactly those files, mapped back to
    * manifest-relative entries. Files holding ANY null in the stats
    * column record no stats (and are never pruned): (min, max) says
    * nothing about null rows, so a whole-file decision made from it —
    * [[rangeFiles]] skipping, [[commitDeleteRange]]'s manifest-only
    * drops — would be unsound for them. The column must be
    * integer-typed: the stats ride the manifest as exact longs.
    */
  private def statEntries(spark: SparkSession, fs: FileSystem, base: Path,
      rels: Seq[String], statsCol: String): Seq[String] = {
    if (rels.isEmpty) return rels
    val byFile = spark.read.parquet(rels.map(qualified(fs, base, _)): _*)
      .select(col(statsCol).cast("long").as("__s"),
        col("_metadata.file_path").as("__f"))
      .groupBy("__f").agg(min("__s").as("lo"), max("__s").as("hi"),
        count(when(col("__s").isNull, lit(1))).as("nulls"))
      .collect() // bounded: one row per new file of this commit
      .flatMap { r =>
        if (r.isNullAt(1) || r.isNullAt(2) || r.getLong(3) > 0L) None
        else Some(r.getString(0) -> (r.getLong(1), r.getLong(2)))
      }.toMap
    rels.map { rel =>
      byFile.collectFirst {
        case (abs, (lo, hi)) if abs.endsWith("/" + rel) ||
          abs == qualified(fs, base, rel) => s"$rel\t$lo\t$hi"
      }.getOrElse(rel)
    }
  }

  /** Relative `data/...` paths of the parquet part files under a commit
    * dir.
    */
  private def commitFiles(fs: FileSystem, base: Path,
      v: Long): Seq[String] = {
    val cd = new Path(base, s"$DataName/c$v")
    fs.listStatus(cd).iterator
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-") &&
        s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$DataName/c$v/${s.getPath.getName}").toSeq.sorted
  }

  private def qualified(fs: FileSystem, base: Path, rel: String): String =
    fs.makeQualified(new Path(base, rel)).toString

  /** Append `df` as a new version; returns the committed version number.
    * The data write targets this commit's own `c<v>` dir (mode overwrite:
    * a crashed attempt at the SAME version left orphans there and no
    * manifest — the retry replaces them wholesale).
    *
    * `statsCol` (an integer-typed column) enables per-file (min, max)
    * MANIFEST STATISTICS — the Iceberg file-skipping discipline:
    * [[readAsOfRange]] prunes the file list driver-side from the
    * manifest alone, no footer reads, no file opens. Enable it on the
    * first commit; every later commit (append, stream batch, delete
    * rewrite, compaction) propagates it automatically via the
    * `#stats=` header, so callers pass it once. Passing a DIFFERENT
    * column than the lake already carries fails loudly.
    */
  def commitAppend(spark: SparkSession, dir: String, df: DataFrame,
      statsCol: Option[String] = None): Long = {
    val (fs, base) = fsOf(spark, dir)
    val v = currentVersion(spark, dir) + 1
    val effective = resolveStatsCol(spark, dir, v - 1, statsCol)
    df.write.mode("overwrite").parquet(s"$dir/$DataName/c$v")
    val prev = if (v == 1) Seq.empty else fileEntries(fs, base, v - 1)
    val fresh = newEntries(spark, fs, base, v, effective)
    writeManifest(fs, base, v, prev ++ fresh,
      headers = effective.map("#stats=" + _).toSeq)
    v
  }

  /** The stats column a new commit must carry: the lake's existing one,
    * or the caller's on the enabling commit — never a silent switch.
    */
  private def resolveStatsCol(spark: SparkSession, dir: String,
      prevV: Long, asked: Option[String]): Option[String] = {
    val carried =
      if (prevV < 1) None else statsColOf(spark, dir, prevV)
    (carried, asked) match {
      case (Some(c), Some(a)) =>
        require(c == a, s"lake at $dir carries stats on '$c' but the " +
          s"commit asked for '$a' — a lake has ONE stats column")
        Some(c)
      case (Some(c), None) => Some(c)
      case (None, a) => a
    }
  }

  /** This commit's new file entries, with stats when the lake carries
    * them.
    */
  private def newEntries(spark: SparkSession, fs: FileSystem, base: Path,
      v: Long, statsCol: Option[String]): Seq[String] = {
    val rels = commitFiles(fs, base, v)
    statsCol.fold(rels)(statEntries(spark, fs, base, rels, _))
  }

  /** Exactly-once streaming append: commit micro-batch `batchId` as a
    * new version, carrying the batch id as a `#batch=` header inside
    * the manifest — so "version committed" and "batch applied" are one
    * rename, and a REPLAYED batch (foreachBatch re-delivers the last
    * uncommitted batch after a restart) is recognized and returns the
    * already-committed version without writing anything. Streaming
    * delivers batches in order, one at a time, so the newest version's
    * header is the complete dedup state — no applied-batch ledger to
    * grow. An OLDER batch id than the newest committed one is a
    * checkpoint/lake pairing error and fails loudly.
    */
  def commitAppendForBatch(spark: SparkSession, dir: String, df: DataFrame,
      batchId: Long): Long = {
    val (fs, base) = fsOf(spark, dir)
    val cur = currentVersion(spark, dir)
    // newest version CARRYING a batch header — maintenance commits
    // (deletes, batch appends) interleave without one and must not
    // blind the replay check
    val lastStream = versions(spark, dir).reverseIterator
      .map(v => (v, batchOf(fs, base, v)))
      .collectFirst { case (v, Some(b)) => (v, b) }
    lastStream match {
      case Some((v, b)) if b == batchId => return v // replay — committed
      case Some((_, b)) => require(b < batchId,
        s"batch $batchId arrived but batch $b is already committed — " +
          "this checkpoint does not belong to this lake")
      case None => ()
    }
    val v = cur + 1
    val effective = resolveStatsCol(spark, dir, v - 1, None)
    df.write.mode("overwrite").parquet(s"$dir/$DataName/c$v")
    val prev = if (v == 1) Seq.empty else fileEntries(fs, base, v - 1)
    writeManifest(fs, base, v,
      prev ++ newEntries(spark, fs, base, v, effective),
      headers = s"#batch=$batchId" +:
        effective.map("#stats=" + _).toSeq)
    v
  }

  /** Drain a stream into the lake, one version per micro-batch, through
    * [[commitAppendForBatch]]'s exactly-once discipline. Processes all
    * available input (Trigger.AvailableNow) and returns.
    */
  def appendStream(df: DataFrame, dir: String,
      checkpointDir: String): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          commitAppendForBatch(
            batch.sparkSession, dir, batch.toDF(), batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** Delete-if-present by id as a new version. Only files that HOLD a
    * deleted id are rewritten (id-column + file-path scan — data columns
    * of unaffected files are never read); the rest carry over by name,
    * so prior versions stay readable byte-for-byte. Returns
    * (version, nFilesRewritten, nRowsRemoved); an empty intersection
    * commits NOTHING and returns version 0 — deleting what isn't there
    * is not history.
    */
  def commitDelete(spark: SparkSession, dir: String, idCol: String,
      ids: DataFrame): (Long, Long, Long) = {
    val (fs, base) = fsOf(spark, dir)
    val cur = currentVersion(spark, dir)
    require(cur > 0, s"commitDelete on an empty lake at $dir")
    val files = readManifest(fs, base, cur)
    if (files.isEmpty) return (0L, 0L, 0L)
    val abs = files.map(qualified(fs, base, _))
    val dels = ids.select(col(ids.columns.head).as(idCol)).distinct()
    // bounded: one row per AFFECTED file (id + metadata column only)
    val hits = spark.read.parquet(abs: _*)
      .select(col(idCol), col("_metadata.file_path").as("__file"))
      .join(dels, Seq(idCol))
      .groupBy("__file").agg(count(lit(1)).as("n"))
      .collect()
    if (hits.isEmpty) return (0L, 0L, 0L)
    val nRemoved = hits.map(_.getLong(1)).sum
    val affectedAbs = hits.map(_.getString(0)).toSet
    // map back to manifest-relative names: qualified-URI equality first,
    // then a scheme-independent suffix match — `_metadata.file_path` and
    // makeQualified can normalize the same file differently on some
    // filesystems (authority/port form), and a relative `data/cN/part-*`
    // suffix identifies a lake file unambiguously either way
    val relByQualified = files.map(f => qualified(fs, base, f) -> f).toMap
    val affectedRel = affectedAbs.toSeq.flatMap { abs =>
      relByQualified.get(abs)
        .orElse(files.find(f => abs.endsWith("/" + f)))
    }.distinct.sorted
    require(affectedRel.size == affectedAbs.size,
      s"commitDelete: ${affectedAbs.size} affected file paths but " +
        s"${affectedRel.size} resolved against the v$cur manifest — " +
        "path qualification mismatch; aborting before any commit")
    val v = cur + 1
    val effective = resolveStatsCol(spark, dir, cur, None)
    spark.read.parquet(affectedRel.map(qualified(fs, base, _)): _*)
      .join(dels, Seq(idCol), "left_anti")
      .write.mode("overwrite").parquet(s"$dir/$DataName/c$v")
    // survivor files keep their manifest ENTRIES verbatim (stats
    // included — their bytes did not change); the rewrite's files get
    // fresh stats under the lake's carried column
    val affectedSet = affectedRel.toSet
    val survivors = fileEntries(fs, base, cur)
      .filterNot(e => affectedSet.contains(entryPath(e)))
    writeManifest(fs, base, v,
      survivors ++ newEntries(spark, fs, base, v, effective),
      headers = effective.map("#stats=" + _).toSeq)
    (v, affectedRel.size.toLong, nRemoved)
  }

  /** MERGE / upsert by id as a new version — the Delta `MERGE WHEN
    * MATCHED UPDATE SET * WHEN NOT MATCHED INSERT *` shape: every
    * update row whose id exists in the lake REPLACES that row; every
    * other update row is inserted. One commit, one rename.
    *
    * File scoping is the same discipline as [[commitDelete]]: matched
    * ids are found by a column-pruned id + `_metadata.file_path` scan,
    * and only files HOLDING a matched id are rewritten — their
    * survivors and the full updates frame land together as this
    * commit's new files, every untouched file carries into the new
    * manifest by name (entry verbatim, stats included). At 100 TB an
    * upsert therefore costs the churn — the touched files plus the
    * updates frame — never a lake rewrite, and prior versions stay
    * readable because old files are never deleted by a commit.
    *
    * Contract: the lake is id-keyed (one row per id — the same
    * contract [[commitDelete]] and the CDC operators assume), and
    * `updates` must carry each id at most once (enforced loudly:
    * "last update wins" among duplicates is nondeterministic under
    * shuffle). `updates` must have exactly the lake's columns (any
    * order). An all-insert upsert (no matched id) commits like an
    * append. Returns (version, nFilesRewritten, nRowsUpdated).
    */
  def commitUpsert(spark: SparkSession, dir: String, idCol: String,
      updates: DataFrame): (Long, Long, Long) = {
    require(currentVersion(spark, dir) > 0,
      s"commitUpsert on an empty lake at $dir — the first commit is " +
        "commitAppend")
    upsertCore(spark, dir, idCol, updates, Nil)
  }

  /** The MERGE body shared by [[commitUpsert]] and
    * [[commitUpsertForBatch]] — handles the empty-lake case (version 0
    * or an empty current manifest) as a pure insert typed by the
    * updates frame; the public batch API allows it (a CDC ingest's
    * first batch creates the lake), the interactive one guards it.
    */
  private def upsertCore(spark: SparkSession, dir: String, idCol: String,
      updates: DataFrame, extraHeaders: Seq[String]): (Long, Long, Long) = {
    val (fs, base) = fsOf(spark, dir)
    val cur = currentVersion(spark, dir)
    val files = if (cur == 0) Seq.empty else readManifest(fs, base, cur)
    // an empty-manifest current version has no schema to align against —
    // the whole upsert is a pure insert typed by the updates frame
    val lakeCols =
      if (files.isEmpty) updates.columns.toSeq
      else readAsOf(spark, dir, cur).columns.toSeq
    require(updates.columns.toSet == lakeCols.toSet,
      s"updates columns ${updates.columns.sorted.mkString(",")} != lake " +
        s"columns ${lakeCols.sorted.mkString(",")}")
    val upd = updates.select(lakeCols.map(col): _*)
    // duplicate ids in ONE updates frame have no deterministic winner —
    // refuse them before anything is written (bounded: limit 1)
    val dup = upd.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"commitUpsert: updates carry id ${dup.head.get(0)} more than " +
        "once — a single MERGE source must be id-unique")
    val updIds = upd.select(col(idCol)).distinct()
    // bounded: one row per AFFECTED file (id + metadata column only)
    val hits =
      if (files.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else spark.read.parquet(files.map(qualified(fs, base, _)): _*)
        .select(col(idCol), col("_metadata.file_path").as("__file"))
        .join(updIds, Seq(idCol))
        .groupBy("__file").agg(count(lit(1)).as("n"))
        .collect()
    val nUpdated = hits.map(_.getLong(1)).sum
    val affectedAbs = hits.map(_.getString(0)).toSet
    val relByQualified = files.map(f => qualified(fs, base, f) -> f).toMap
    val affectedRel = affectedAbs.toSeq.flatMap { abs =>
      relByQualified.get(abs)
        .orElse(files.find(f => abs.endsWith("/" + f)))
    }.distinct.sorted
    require(affectedRel.size == affectedAbs.size,
      s"commitUpsert: ${affectedAbs.size} affected file paths but " +
        s"${affectedRel.size} resolved against the v$cur manifest — " +
        "path qualification mismatch; aborting before any commit")
    val v = cur + 1
    val effective = resolveStatsCol(spark, dir, cur, None)
    val fresh =
      if (affectedRel.isEmpty) upd
      else spark.read.parquet(affectedRel.map(qualified(fs, base, _)): _*)
        .join(updIds, Seq(idCol), "left_anti")
        .select(lakeCols.map(col): _*)
        .unionByName(upd)
    fresh.write.mode("overwrite").parquet(s"$dir/$DataName/c$v")
    val affectedSet = affectedRel.toSet
    val survivors =
      if (cur == 0) Seq.empty
      else fileEntries(fs, base, cur)
        .filterNot(e => affectedSet.contains(entryPath(e)))
    writeManifest(fs, base, v,
      survivors ++ newEntries(spark, fs, base, v, effective),
      headers = extraHeaders ++ effective.map("#stats=" + _).toSeq)
    (v, affectedRel.size.toLong, nUpdated)
  }

  /** Exactly-once streaming MERGE: commit micro-batch `batchId`'s
    * id-keyed updates as ONE upsert version carrying the batch id as a
    * manifest header — [[commitAppendForBatch]]'s replay discipline
    * applied to [[commitUpsert]]'s merge semantics. A replayed batch
    * (foreachBatch re-delivers the last uncommitted batch after a
    * restart) is recognized and writes NOTHING, not even reading its
    * rows; an OLDER batch id is a checkpoint/lake pairing error and
    * fails loudly; headerless maintenance commits (deletes,
    * compactions) interleave without blinding the check. The first
    * batch may CREATE the lake — a CDC ingest starts somewhere.
    * Returns the committed (or already-committed) version.
    */
  def commitUpsertForBatch(spark: SparkSession, dir: String,
      idCol: String, df: DataFrame, batchId: Long): Long = {
    val (fs, base) = fsOf(spark, dir)
    val lastStream = versions(spark, dir).reverseIterator
      .map(v => (v, batchOf(fs, base, v)))
      .collectFirst { case (v, Some(b)) => (v, b) }
    lastStream match {
      case Some((v, b)) if b == batchId => return v // replay — committed
      case Some((_, b)) => require(b < batchId,
        s"batch $batchId arrived but batch $b is already committed — " +
          "this checkpoint does not belong to this lake")
      case None => ()
    }
    upsertCore(spark, dir, idCol, df, Seq(s"#batch=$batchId"))._1
  }

  /** Drain a CDC-shaped stream into the lake as one MERGE version per
    * micro-batch, through [[commitUpsertForBatch]]'s exactly-once
    * discipline. Each batch must be id-unique (dedupe upstream — e.g.
    * keep the newest row per key inside foreachBatch); batches apply in
    * delivery order, so cross-batch last-writer-wins follows from the
    * stream's own ordering. Processes all available input
    * (Trigger.AvailableNow) and returns.
    */
  def upsertStream(df: DataFrame, dir: String, idCol: String,
      checkpointDir: String): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          commitUpsertForBatch(
            batch.sparkSession, dir, idCol, batch.toDF(), batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** The row-level changes between two committed versions — the Delta
    * change-data-feed shape, derived from the MANIFEST DIFF alone:
    * files present only in `vFrom` and files present only in `vTo` are
    * read, everything both versions share by name is never opened. The
    * two multiset differences of those file contents ARE the membership
    * delta (untouched files are byte-identical by the immutability
    * contract), so at 100 TB the cost is bounded by the CHURN between
    * the versions, not the lake.
    *
    * Returns the lake's columns plus `change_type`:
    * `insert` / `delete`, and for ids present on BOTH sides (an upsert
    * replaced the row) `update_preimage` / `update_postimage` — the
    * id-pairing assumes the lake's one-row-per-id contract, like every
    * mutation here. Two reads of the same content (e.g. across a
    * [[compact]], which rewrites every file name) diff to zero changes
    * but DO read both layouts — compaction is the one commit kind whose
    * churn is the whole lake. A replaced row whose bytes did not change
    * cancels out and reports nothing, which is the CDC semantics a
    * consumer wants (no-op updates are not changes).
    */
  def changesBetween(spark: SparkSession, dir: String, vFrom: Long,
      vTo: Long, idCol: String,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    require(vFrom <= vTo,
      s"changesBetween: vFrom=$vFrom must not exceed vTo=$vTo")
    val (fs, base) = fsOf(spark, dir)
    val from = readManifest(fs, base, vFrom)
    val to = readManifest(fs, base, vTo)
    val toSet = to.toSet
    val fromSet = from.toSet
    val removed = from.filterNot(toSet.contains)
    val added = to.filterNot(fromSet.contains)
    val schema: org.apache.spark.sql.types.StructType =
      (added ++ removed).headOption match {
        case Some(rel) =>
          spark.read.parquet(qualified(fs, base, rel)).schema
        case None => schemaHint.getOrElse(throw new IllegalArgumentException(
          s"versions $vFrom and $vTo of $dir share every file (no " +
            "changes) and no schemaHint was given for the empty result"))
      }
    def side(rels: Seq[String]): DataFrame =
      if (rels.nonEmpty)
        spark.read.parquet(rels.map(qualified(fs, base, _)): _*)
          .select(schema.fieldNames.toSeq.map(col): _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val a = side(removed) // rows leaving between vFrom and vTo
    val b = side(added)   // rows arriving
    val dels = a.exceptAll(b)
    val ins = b.exceptAll(a)
    // ids on both sides = replacements; churn-bounded, AQE sizes the join
    val both = dels.select(col(idCol)).distinct()
      .join(ins.select(col(idCol)).distinct(), Seq(idCol), "inner")
      .withColumn("__upd", lit(true))
    def tag(df: DataFrame, updType: String, plainType: String): DataFrame =
      df.join(both, Seq(idCol), "left")
        .withColumn("change_type",
          when(col("__upd"), updType).otherwise(plainType))
        .drop("__upd")
        .select((schema.fieldNames.toSeq :+ "change_type").map(col): _*)
    tag(dels, "update_preimage", "delete")
      .unionByName(tag(ins, "update_postimage", "insert"))
  }

  /** Range delete on the stats column — the TTL/retention shape
    * (`DELETE WHERE ts BETWEEN ...`) with the Iceberg metadata-delete
    * optimization: manifest statistics classify every file
    * driver-side, files FULLY inside `[lower, upper]` leave the new
    * manifest WITHOUT being read or rewritten (a whole-partition
    * retention sweep is a manifest-only commit), only files
    * STRADDLING a range boundary rewrite (their surviving rows), and
    * files outside the range carry over by name. At 100 TB this is
    * the difference between a retention job that rewrites a year of
    * data and one that drops it by name — the dropped files stay on
    * disk for time travel, reclaimed by [[vacuum]] like every other
    * dead file.
    *
    * Files WITHOUT stats (null-bearing, all-null, or pre-stats
    * commits) cannot be classified whole, so they are treated as
    * straddling and rewritten — never silently kept. NULLs in the
    * stats column never match a range (SQL semantics) and survive
    * every range delete.
    * Requires the lake to carry a stats column. Returns
    * (version, filesDropped, filesRewritten, rowsRemoved) — dropped
    * files' row counts come from parquet footers only (no data read);
    * an empty intersection commits nothing and returns version 0.
    */
  def commitDeleteRange(spark: SparkSession, dir: String,
      lower: Long, upper: Long): (Long, Long, Long, Long) = {
    require(lower <= upper,
      s"commitDeleteRange: lower=$lower exceeds upper=$upper")
    val (fs, base) = fsOf(spark, dir)
    val cur = currentVersion(spark, dir)
    require(cur > 0, s"commitDeleteRange on an empty lake at $dir")
    val statsCol = statsColOf(spark, dir, cur).getOrElse(throw
      new IllegalArgumentException(s"lake at $dir carries no manifest " +
        "statistics — commitAppend(statsCol=...) enables them"))
    val entries = fileEntries(fs, base, cur)
    if (entries.isEmpty) return (0L, 0L, 0L, 0L)
    // driver-side classification from the manifest alone
    val (inside, rest) = entries.partition(e => entryStats(e).exists {
      case (lo, hi) => lo >= lower && hi <= upper
    })
    val (straddling, outside) = rest.partition(e => entryStats(e) match {
      case Some((lo, hi)) => hi >= lower && lo <= upper
      case None => true // unclassifiable: rewrite, never silently keep
    })
    if (inside.isEmpty && straddling.isEmpty) return (0L, 0L, 0L, 0L)
    // dropped rows counted from footers only (a count() over parquet
    // with no filter is metadata-driven — no column data is read)
    val droppedRows =
      if (inside.isEmpty) 0L
      else spark.read
        .parquet(inside.map(e => qualified(fs, base, entryPath(e))): _*)
        .count()
    val v = cur + 1
    // survivors of the straddlers — COUNTED before anything is
    // written, so a delete that turns out to match nothing (possible
    // when only stats-less files were classifiable-as-straddling)
    // commits nothing instead of a pointless rewrite
    val srcOpt =
      if (straddling.isEmpty) None
      else Some(spark.read.parquet(
        straddling.map(e => qualified(fs, base, entryPath(e))): _*))
    // nulls never match a range — they must SURVIVE (a bare !between
    // would drop them: three-valued logic)
    val survivorsOpt = srcOpt.map(_.filter(coalesce(
      !col(statsCol).cast("long").between(lower, upper), lit(true))))
    val removedFromStraddling = (srcOpt, survivorsOpt) match {
      case (Some(src), Some(sv)) => src.count() - sv.count()
      case _ => 0L
    }
    if (droppedRows == 0L && removedFromStraddling == 0L)
      return (0L, 0L, 0L, 0L) // nothing actually matched
    val rewritten = survivorsOpt match {
      case Some(sv) =>
        sv.write.mode("overwrite").parquet(s"$dir/$DataName/c$v")
        newEntries(spark, fs, base, v, Some(statsCol))
      case None => Seq.empty[String]
    }
    writeManifest(fs, base, v, outside ++ rewritten,
      headers = Seq("#stats=" + statsCol))
    (v, inside.size.toLong, straddling.size.toLong,
      droppedRows + removedFromStraddling)
  }

  /** The lake exactly as version `v` committed it — an explicit file
    * list, no directory listing, no partition discovery. A version with
    * an empty manifest reads as an empty frame of `schemaHint` (schema
    * inference has no file to read). `mergeSchema` unions the file
    * schemas (columns appended by later commits read as NULL in older
    * files) at the cost of a footer read per file; off by default —
    * same-schema commits take the first file's schema for free.
    */
  def readAsOf(spark: SparkSession, dir: String, v: Long,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val (fs, base) = fsOf(spark, dir)
    val files = readManifest(fs, base, v)
    if (files.nonEmpty)
      spark.read.option("mergeSchema", mergeSchema.toString)
        .parquet(files.map(qualified(fs, base, _)): _*)
    else schemaHint match {
      case Some(sc) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
      case None => throw new IllegalArgumentException(
        s"version $v of $dir is empty and no schemaHint was given")
    }
  }

  /** The data files that ARE version `v`, manifest-relative. */
  def filesOf(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    val (fs, base) = fsOf(spark, dir)
    readManifest(fs, base, v)
  }

  /** Version `v`'s files whose manifest stats ADMIT `[lower, upper]` on
    * the lake's stats column — the driver-side skip decision, from the
    * manifest alone: no footer read, no file open. Files without stats
    * (all-null, or committed before stats were enabled) are never
    * pruned. Returns (admitted files, total files).
    */
  def rangeFiles(spark: SparkSession, dir: String, v: Long,
      lower: Long, upper: Long): (Seq[String], Long) = {
    val (fs, base) = fsOf(spark, dir)
    val entries = fileEntries(fs, base, v)
    val kept = entries.filter { e =>
      entryStats(e).forall { case (lo, hi) => hi >= lower && lo <= upper }
    }.map(entryPath)
    (kept, entries.size.toLong)
  }

  /** The rows of version `v` whose stats column lies in
    * `[lower, upper]` — manifest stats prune the file list FIRST
    * ([[rangeFiles]]), then the residual predicate runs over only the
    * admitted files (whose row groups parquet min/max prune further).
    * Requires the lake to carry a stats column. At 100 TB this is the
    * difference between opening every file of a version and opening the
    * few whose range can match.
    */
  def readAsOfRange(spark: SparkSession, dir: String, v: Long,
      lower: Long, upper: Long,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val statsCol = statsColOf(spark, dir, v).getOrElse(throw
      new IllegalArgumentException(s"version $v of $dir carries no " +
        "manifest statistics — commitAppend(statsCol=...) enables them"))
    val (fs, base) = fsOf(spark, dir)
    val (kept, _) = rangeFiles(spark, dir, v, lower, upper)
    val frame =
      if (kept.nonEmpty)
        spark.read.parquet(kept.map(qualified(fs, base, _)): _*)
      else schemaHint match {
        case Some(sc) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
        case None => throw new IllegalArgumentException(
          s"range [$lower,$upper] admits no file of version $v and no " +
            "schemaHint was given")
      }
    frame.filter(col(statsCol).cast("long").between(lower, upper))
  }

  /** Maintenance rewrite: the CURRENT version's content re-laid-out
    * into `nFiles` files as a NEW version — small commits and
    * file-scoped deletes fragment the file list, and an object-store
    * read pays per file. Content-identical by construction (one read,
    * one write, a manifest of only the new files); prior versions are
    * untouched and stay readable — fragmented history is reclaimed by
    * [[vacuum]] once it ages out, never by the compaction itself.
    *
    * `sortCol` additionally CLUSTERS the layout (the OPTIMIZE/CLUSTER
    * BY half of the Iceberg discipline): rows are range-partitioned on
    * the column and sorted within each file, so per-file (min, max)
    * become near-disjoint instead of each file spanning the whole
    * domain — which is what makes the manifest statistics actually
    * prune after interleaved ingest (a lake whose every file covers
    * the full key range admits every file to every range read, stats
    * or not). Range boundaries come from Spark's distributed sampler —
    * no global sort, no driver materialization — so admitted-file
    * counts after clustering are tight but not byte-deterministic; the
    * invariants (membership identity, admission never worse) are.
    * Returns the new version.
    */
  def compact(spark: SparkSession, dir: String, nFiles: Int = 8,
      sortCol: Option[String] = None): Long = {
    require(nFiles >= 1, s"compact needs nFiles >= 1, got $nFiles")
    val (fs, base) = fsOf(spark, dir)
    val cur = currentVersion(spark, dir)
    require(cur > 0, s"compact on an empty lake at $dir")
    if (readManifest(fs, base, cur).isEmpty) return cur // nothing to lay out
    val v = cur + 1
    val effective = resolveStatsCol(spark, dir, cur, None)
    val current = readAsOf(spark, dir, cur)
    val laid = sortCol match {
      case Some(c) => current.repartitionByRange(nFiles, col(c))
        .sortWithinPartitions(col(c))
      case None => current.repartition(nFiles)
    }
    laid.write.mode("overwrite").parquet(s"$dir/$DataName/c$v")
    writeManifest(fs, base, v, newEntries(spark, fs, base, v, effective),
      headers = effective.map("#stats=" + _).toSeq)
    v
  }

  /** Roll the lake BACK to version `v` as a NEW commit (the Delta
    * RESTORE shape): the new manifest lists exactly `v`'s file entries
    * — no data is read, copied, or rewritten, because the restored
    * files still exist on disk (commits never delete; only [[vacuum]]
    * does, and it refuses to touch referenced files). History stays
    * linear and append-only: the bad commits remain inspectable (and
    * feedable to [[changesBetween]] — a restore surfaces to CDC
    * consumers as the inverse of what it undoes), and the restore
    * itself can be restored away. Fails loudly if `v` was vacuumed.
    * Restoring the current version is refused — an empty commit is not
    * history. Returns the new version.
    */
  def restore(spark: SparkSession, dir: String, v: Long): Long = {
    val (fs, base) = fsOf(spark, dir)
    val cur = currentVersion(spark, dir)
    require(cur > 0, s"restore on an empty lake at $dir")
    require(v < cur,
      s"restore target v$v is not BEHIND the current version v$cur")
    val entries = fileEntries(fs, base, v) // loud if vacuumed
    // the restored version's stats column (possibly none) becomes the
    // lake's again — a restore rolls back the WHOLE table state,
    // including whether statistics were enabled
    val stats = statsColOf(spark, dir, v)
    val nv = cur + 1
    writeManifest(fs, base, nv, entries,
      headers = stats.map("#stats=" + _).toSeq)
    nv
  }

  /** The commit log as a frame: (version, n_files, batch_id) — batch_id
    * NULL for maintenance commits (deletes, batch appends, compactions).
    * Driver-built from the manifests (bounded by version count).
    */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val (fs, base) = fsOf(spark, dir)
    import spark.implicits._
    versions(spark, dir).map { v =>
      (v, readManifest(fs, base, v).size.toLong, batchOf(fs, base, v))
    }.toDF("version", "n_files", "batch_id")
  }

  /** Latest version as a frame. */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAsOf(spark, dir, currentVersion(spark, dir))

  /** (version, commit epoch-millis) ascending — timestamps are the
    * manifest files' own modification times, so no manifest format
    * change and lakes committed before this API existed carry them
    * already. The manifest is created (side-name write + rename) at
    * publish time, which IS the commit instant; single-writer, so
    * times are monotone with versions on any store with sane clocks.
    */
  def commitTimes(spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val (fs, base) = fsOf(spark, dir)
    versions(spark, dir).map { v =>
      v -> fs.getFileStatus(manifestPath(base, v)).getModificationTime
    }
  }

  /** Timestamp time travel (the Iceberg/Delta entry point): the newest
    * version committed at or before `tsMillis`. Loud when the
    * timestamp predates every surviving commit — the caller asked for
    * state that never existed (or was vacuumed).
    */
  def versionAsOf(spark: SparkSession, dir: String,
      tsMillis: Long): Long = {
    val times = commitTimes(spark, dir)
    require(times.nonEmpty, s"versionAsOf on an empty lake at $dir")
    val at = times.filter(_._2 <= tsMillis)
    require(at.nonEmpty,
      s"timestamp $tsMillis predates every commit of $dir (earliest: " +
        s"v${times.head._1} at ${times.head._2})")
    at.map(_._1).max
  }

  /** The lake as of a wall-clock instant — [[versionAsOf]] then
    * [[readAsOf]].
    */
  def readAsOfTimestamp(spark: SparkSession, dir: String, tsMillis: Long,
      schemaHint: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame =
    readAsOf(spark, dir, versionAsOf(spark, dir, tsMillis), schemaHint)

  /** Reclaim storage: drop manifests below `keepFrom` and every data
    * file no surviving manifest references (which also sweeps orphans
    * of crashed commits). Versions >= `keepFrom` stay readable
    * byte-for-byte; older reads fail loudly at the manifest probe.
    * Returns (manifestsDropped, dataFilesDeleted). Runs under the same
    * single-writer contract as the commits.
    */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long)
      : (Long, Long) = {
    val (fs, base) = fsOf(spark, dir)
    val all = versions(spark, dir)
    require(all.nonEmpty, s"vacuum on an empty lake at $dir")
    val (drop, keep) = all.partition(_ < keepFrom)
    require(keep.nonEmpty,
      s"vacuum(keepFrom=$keepFrom) would drop EVERY version of $dir")
    val referenced = keep.iterator
      .flatMap(v => readManifest(fs, base, v)).toSet
    var deleted = 0L
    val dataDir = new Path(base, DataName)
    if (fs.exists(dataDir)) fs.listStatus(dataDir).foreach { cd =>
      if (cd.isDirectory) {
        def rel(name: String) = s"$DataName/${cd.getPath.getName}/$name"
        val entries = fs.listStatus(cd.getPath)
        val parts = entries.filter(f => f.isFile &&
          f.getPath.getName.startsWith("part-") &&
          f.getPath.getName.endsWith(".parquet"))
        if (!parts.exists(f => referenced.contains(rel(f.getPath.getName)))) {
          // nothing referenced: the whole commit dir goes — this also
          // sweeps crashed commits' orphans with their write markers
          deleted += parts.length
          require(fs.delete(cd.getPath, true),
            s"vacuum: delete ${cd.getPath} failed")
        } else parts.foreach { f =>
          // partially referenced (a delete rewrote some of its files):
          // drop only the dead part files and their checksum siblings,
          // never the live files' write metadata
          if (!referenced.contains(rel(f.getPath.getName))) {
            require(fs.delete(f.getPath, false),
              s"vacuum: delete ${rel(f.getPath.getName)} failed")
            fs.delete(new Path(cd.getPath, s".${f.getPath.getName}.crc"),
              false): Unit
            deleted += 1
          }
        }
      }
    }
    drop.foreach { v =>
      require(fs.delete(manifestPath(base, v), false),
        s"vacuum: dropping manifest v$v failed")
    }
    (drop.size.toLong, deleted)
  }
}
