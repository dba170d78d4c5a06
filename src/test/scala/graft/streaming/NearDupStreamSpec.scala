package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Streaming near-dup dedup ([[NearDupStream]]): a delta stream matched
  * per micro-batch against a persisted corpus LSH state. Pinned: the
  * merged streaming result EQUALS the one-shot batch operator
  * ([[Dedup.incrementalNearDups]]) whatever the batch-boundary
  * placement, per-batch leaves are replay-idempotent by layout, and a
  * fresh checkpoint clears stale leaves from a dead run.
  */
class NearDupStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** corpus doc i and delta doc 1000+i share most tokens for i < 8 (near
    * dups); the rest are noise. Multi-word docs so 3-gram shingles exist.
    */
  private def fixture() = {
    val corpus = (0 until 40).map { i =>
      (i.toLong, (0 until 12).map(t => s"c${i}_$t").mkString(" "))
    }.toDF("doc_id", "text")
    // near-dups: copy corpus doc i's text, change the final token
    val near = (0 until 8).map { i =>
      (1000L + i, (0 until 11).map(t => s"c${i}_$t").mkString(" ") + " zz")
    }
    val noise = (8 until 20).map { i =>
      (1000L + i, (0 until 12).map(t => s"d${i}_$t").mkString(" "))
    }
    val delta = (near ++ noise).toDF("doc_id", "text")
    (corpus, delta)
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("corpus_id", "delta_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("streamed micro-batches equal the one-shot batch operator") {
    val (corpus, delta) = fixture()
    val dir = Files.createTempDirectory("neardup_spec_")
    NearDupStream.writeCorpusState(corpus, "doc_id", "text", s"$dir/state")
    delta.repartition(4).write.parquet(s"$dir/delta") // 4 files -> 4 batches
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/delta")
    // relative snapshot: other suites sharing this JVM's session may
    // hold their own persists — only the STREAM must not add any
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val streamed = NearDupStream.nearDupPairs(spark, stream, "doc_id",
      "text", s"$dir/state", s"$dir/pairs", checkpointDir = s"$dir/ckpt",
      threshold = 0.3)
    // per-batch persists were released (continuous-deployment hygiene) —
    // checked BEFORE the batch comparison below creates its own persists
    assert(spark.sparkContext.getPersistentRDDs.keySet == persistedBefore,
      "per-batch persists leaked past the stream")
    val batch = Dedup.incrementalNearDups(corpus, delta, "doc_id", "text",
      threshold = 0.3)
    assert(pairs(streamed) === pairs(batch))
    assert(pairs(streamed).map(_._2).intersect(
      (1000L until 1008L).toSet).size === 8,
      "every planted near-dup must be found")
    // real micro-batching happened: more than one leaf in the lake
    val leaves = Option(new java.io.File(s"$dir/pairs").listFiles())
      .getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("batch_id="))
    assert(leaves >= 4, s"expected >= 4 batch leaves, got $leaves")
  }

  test("appendToCorpusState: state+append equals a full rebuild; k mismatch rejected") {
    val (corpus, delta) = fixture()
    val base = corpus.filter(col("doc_id") % 2 === 1)
    val accepted = corpus.filter(col("doc_id") % 2 === 0)
    val dir = Files.createTempDirectory("neardup_append_")
    NearDupStream.writeCorpusState(base, "doc_id", "text", s"$dir/state")
    NearDupStream.appendToCorpusState(accepted, "doc_id", "text",
      s"$dir/state")
    // the appended state IS the full rebuild, row for row
    val appended = spark.read.parquet(s"$dir/state")
    val rebuilt = Dedup.nearDupState(corpus, "doc_id", "text")
    assert(appended.exceptAll(rebuilt).count() === 0L &&
      rebuilt.exceptAll(appended).count() === 0L)
    // and matching against it equals the one-shot batch operator
    val viaState = Dedup.nearDupsAgainstState(appended, delta, "doc_id",
      "text", threshold = 0.3)
    val oneShot = Dedup.incrementalNearDups(corpus, delta, "doc_id",
      "text", threshold = 0.3)
    assert(pairs(viaState) === pairs(oneShot))
    // a k mismatch would band-slice garbage — fail fast instead
    val e = intercept[IllegalArgumentException] {
      NearDupStream.appendToCorpusState(accepted, "doc_id", "text",
        s"$dir/state", k = 16)
    }
    assert(e.getMessage.contains("32-wide"))
  }

  test("applyChangesToCorpusState: the synced state equals a rebuild " +
      "over the lake's new membership") {
    import graft.sinks.VersionedLake
    val (corpus, delta) = fixture()
    val dir = Files.createTempDirectory("neardup_sync_")
    val lake = s"$dir/lake"
    val state = s"$dir/state"
    VersionedLake.commitAppend(spark, lake, corpus): Unit
    NearDupStream.writeCorpusState(corpus, "doc_id", "text", state)
    // MERGE: doc 3 takes doc 0's text (update), 500 arrives (insert);
    // then docs 5 and 6 are taken down
    val updates = Seq(
      (3L, (0 until 12).map(t => s"c0_$t").mkString(" ")),
      (500L, (0 until 12).map(t => s"x_$t").mkString(" ")))
      .toDF("doc_id", "text")
    VersionedLake.commitUpsert(spark, lake, "doc_id", updates): Unit
    VersionedLake.commitDelete(spark, lake, "doc_id",
      Seq(5L, 6L).toDF("doc_id")): Unit
    val feed = VersionedLake.changesBetween(spark, lake, 1L, 3L, "doc_id")
    val (nDep, nArr) = NearDupStream.applyChangesToCorpusState(
      feed, "doc_id", "text", state)
    assert(nDep === 3L, "doc 3's preimage + docs 5/6 depart")
    assert(nArr === 2L, "doc 3's postimage + doc 500 arrive")
    // synced state == a rebuild over the lake's final membership
    val synced = spark.read.parquet(state)
    val rebuilt = Dedup.nearDupState(
      VersionedLake.read(spark, lake), "doc_id", "text")
    assert(synced.exceptAll(rebuilt).count() === 0L &&
      rebuilt.exceptAll(synced).count() === 0L)
    // and matching equals the one-shot operator over that membership:
    // delta 1000 must now match corpus 0 AND the updated doc 3, while
    // departed docs 5/6 must not match anything
    val viaState = Dedup.nearDupsAgainstState(synced, delta, "doc_id",
      "text", threshold = 0.3)
    val oneShot = Dedup.incrementalNearDups(
      VersionedLake.read(spark, lake), delta, "doc_id", "text",
      threshold = 0.3)
    assert(pairs(viaState) === pairs(oneShot))
    assert(pairs(viaState).exists { case (c, d, _) => c == 3L && d == 1000L })
    assert(!pairs(viaState).exists { case (c, _, _) => c == 5L || c == 6L })
  }

  test("cursor sync: exactly-once owned by the operator — state+cursor " +
      "promote in one rename, retries converge, guards loud") {
    import graft.sinks.VersionedLake
    val (corpus, delta) = fixture()
    val dir = Files.createTempDirectory("neardup_cursor_")
    val lake = s"$dir/lake"
    val state = s"$dir/state"
    VersionedLake.commitAppend(spark, lake, corpus): Unit
    assert(NearDupStream.writeCorpusStateFromLake(
      spark, lake, state, "doc_id", "text") === 1L)
    // a state built by the PLAIN writer has no cursor — loud
    val bare = s"$dir/bare"
    NearDupStream.writeCorpusState(corpus, "doc_id", "text", bare)
    val ex = intercept[IllegalArgumentException] {
      NearDupStream.syncCorpusStateFromLake(
        spark, lake, bare, "doc_id", "text")
    }
    assert(ex.getMessage.contains("no version cursor"))
    // mutate the lake: update 3 -> doc 0's text, insert 500, delete 5/6
    VersionedLake.commitUpsert(spark, lake, "doc_id", Seq(
      (3L, (0 until 12).map(t => s"c0_$t").mkString(" ")),
      (500L, (0 until 12).map(t => s"x_$t").mkString(" ")))
      .toDF("doc_id", "text")): Unit
    VersionedLake.commitDelete(spark, lake, "doc_id",
      Seq(5L, 6L).toDF("doc_id")): Unit
    val (f1, t1, n1) = NearDupStream.syncCorpusStateFromLake(
      spark, lake, state, "doc_id", "text")
    assert(f1 === 1L && t1 === 3L && n1 > 0L)
    // retry after success: cursor-only no-op — nothing re-applied
    assert(NearDupStream.syncCorpusStateFromLake(
      spark, lake, state, "doc_id", "text") === ((3L, 3L, 0L)))
    // synced == a rebuild over the lake's final membership
    val rebuilt = Dedup.nearDupState(
      VersionedLake.read(spark, lake), "doc_id", "text")
    val synced = spark.read.parquet(state)
    assert(synced.exceptAll(rebuilt).count() === 0L &&
      rebuilt.exceptAll(synced).count() === 0L)
    // crash between the swap's two renames: state parked at the backup
    // name; the next sync's recovery preamble restores it, then no-ops
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(state),
      new org.apache.hadoop.fs.Path(state + ".sync_backup")))
    assert(NearDupStream.syncCorpusStateFromLake(
      spark, lake, state, "doc_id", "text") === ((3L, 3L, 0L)))
    assert(spark.read.parquet(state).count() === rebuilt.count())
    // a state paired with a DIFFERENT (shorter) lake fails loudly
    val other = s"$dir/otherlake"
    VersionedLake.commitAppend(spark, other, corpus.limit(3)): Unit
    val ex2 = intercept[IllegalArgumentException] {
      NearDupStream.syncCorpusStateFromLake(
        spark, other, state, "doc_id", "text")
    }
    assert(ex2.getMessage.contains("does not belong"))
  }

  test("stale-leaf cleanup resolves through the Hadoop FileSystem (file: URIs)") {
    // URI-addressed state/out/checkpoint — the HDFS/S3 deployment
    // shape. java.nio's Paths.get("file:/...") is a literal relative
    // name that never exists, so the pre-port cleanup silently kept the
    // dead run's leaf and the merged read double-counted it.
    val (corpus, delta) = fixture()
    val dir = "file:" + Files.createTempDirectory("neardup_spec_fs_")
    NearDupStream.writeCorpusState(corpus, "doc_id", "text", s"$dir/state")
    delta.coalesce(1).write.parquet(s"$dir/delta")
    Seq((999999L, 999999L, 1.0))
      .toDF("corpus_id", "delta_id", "jaccard")
      .write.parquet(s"$dir/pairs/batch_id=7")
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/delta")
    val streamed = NearDupStream.nearDupPairs(spark, stream, "doc_id",
      "text", s"$dir/state", s"$dir/pairs", checkpointDir = s"$dir/ckpt",
      threshold = 0.3)
    assert(!pairs(streamed).exists(_._1 == 999999L),
      "URI-addressed lake kept a dead run's leaf: cleanup did not " +
        "resolve through the Hadoop FileSystem")
    assert(pairs(streamed).map(_._2).intersect(
      (1000L until 1008L).toSet).size === 8)
  }

  test("an empty delta stream returns an empty frame, not a read failure") {
    val (corpus, _) = fixture()
    val dir = Files.createTempDirectory("neardup_spec_empty_")
    NearDupStream.writeCorpusState(corpus, "doc_id", "text", s"$dir/state")
    Files.createDirectories(dir.resolve("delta")) // zero input files
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/delta")
    val streamed = NearDupStream.nearDupPairs(spark, stream, "doc_id",
      "text", s"$dir/state", s"$dir/pairs", checkpointDir = s"$dir/ckpt")
    assert(streamed.columns.toSeq === Seq("corpus_id", "delta_id", "jaccard"))
    assert(streamed.count() === 0L)
  }

  test("fresh checkpoint clears stale leaves from a dead run") {
    val (corpus, delta) = fixture()
    val dir = Files.createTempDirectory("neardup_spec2_")
    NearDupStream.writeCorpusState(corpus, "doc_id", "text", s"$dir/state")
    delta.coalesce(1).write.parquet(s"$dir/delta")
    // a dead run's leaf with a conflicting id far beyond this run's range
    Seq((999999L, 999999L, 1.0))
      .toDF("corpus_id", "delta_id", "jaccard")
      .write.parquet(s"$dir/pairs/batch_id=7")
    val stream = spark.readStream.schema(delta.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/delta")
    val streamed = NearDupStream.nearDupPairs(spark, stream, "doc_id",
      "text", s"$dir/state", s"$dir/pairs", checkpointDir = s"$dir/ckpt",
      threshold = 0.3)
    assert(!pairs(streamed).exists(_._1 == 999999L),
      "stale leaf from a dead run must be cleared on a fresh checkpoint")
  }
}
