package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The production streaming-partials shape ([[PartialAggs]]): per-batch
  * mergeable partials land in a `batch_id=`-partitioned parquet lake and
  * the read side re-merges with the dual aggregate. Pinned here: the
  * merged view equals the one-batch aggregate whatever the
  * batch-boundary placement, replaying a batch is idempotent (the
  * Overwrite-the-leaf contract), restart against a shared checkpoint
  * processes only new data, and per-batch audit rows survive in the
  * lake's partition layout.
  */
class PartialAggsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val spec = PartialAggs.Spec(
    keys = Seq("k"), countAs = Some("n"),
    sums = Seq("v" -> "sum_v"), mins = Seq("v" -> "min_v"),
    maxes = Seq("v" -> "max_v"))

  private def writeRows(dir: java.nio.file.Path, name: String,
      rows: Seq[(String, Long)]): Unit =
    Files.writeString(dir.resolve(name),
      rows.map { case (k, v) => s"""{"k":"$k","v":$v}""" }.mkString("\n"))

  private def drain(in: java.nio.file.Path, lake: String,
      ckpt: java.nio.file.Path): Long = {
    val stream = spark.readStream
      .schema("k STRING, v LONG")
      .option("maxFilesPerTrigger", 1) // one input file per micro-batch
      .json(in.toString)
    PartialAggs.writePartials(stream, spec, lake, ckpt.toString)
  }

  test("merged lake equals the one-batch aggregate across micro-batches") {
    val in = Files.createTempDirectory("pa_in")
    val lake = Files.createTempDirectory("pa_lake").toString + "/t"
    val ckpt = Files.createTempDirectory("pa_ckpt")
    writeRows(in, "a.json", Seq(("x", 1L), ("y", 10L), ("x", 3L)))
    writeRows(in, "b.json", Seq(("y", 7L), ("z", 100L)))
    writeRows(in, "c.json", Seq(("x", -5L), ("z", 4L)))
    val batches = drain(in, lake, ckpt)
    assert(batches >= 2) // maxFilesPerTrigger=1 → one batch per file

    val merged = PartialAggs.readMerged(spark, spec, lake)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(merged === Seq(
      ("x", 3L, -1L, -5L, 3L),
      ("y", 2L, 17L, 7L, 10L),
      ("z", 2L, 104L, 4L, 100L)))

    // the lake is the state: one partition leaf per batch, audit-scannable
    val leaves = spark.read.option("basePath", lake).parquet(lake)
      .select("batch_id").distinct().count()
    assert(leaves === batches)
  }

  test("replaying a batch into its leaf is idempotent (crash-replay contract)") {
    val in = Files.createTempDirectory("pa_in2")
    val lake = Files.createTempDirectory("pa_lake2").toString + "/t"
    val ckpt = Files.createTempDirectory("pa_ckpt2")
    writeRows(in, "a.json", Seq(("x", 1L), ("x", 2L)))
    drain(in, lake, ckpt)
    val before = PartialAggs.readMerged(spark, spec, lake)
      .collect().map(_.toSeq).toSeq

    // simulate foreachBatch replay: re-write batch 0's leaf from the
    // same input — Overwrite must leave the merged view unchanged
    val replay = Seq(("x", 1L), ("x", 2L)).toDF("k", "v")
    spec.partial(replay).write.mode("overwrite").parquet(s"$lake/batch_id=0")
    val after = PartialAggs.readMerged(spark, spec, lake)
      .collect().map(_.toSeq).toSeq
    assert(after === before)
  }

  test("a fresh-checkpoint re-run clears stale leaves instead of double-counting") {
    val in = Files.createTempDirectory("pa_in4")
    val lake = Files.createTempDirectory("pa_lake4").toString + "/t"
    writeRows(in, "a.json", Seq(("x", 1L)))
    writeRows(in, "b.json", Seq(("x", 2L)))
    // run 1: fresh checkpoint → leaves 0 and 1
    drain(in, lake, Files.createTempDirectory("pa_ck4a"))
    // run 2: ANOTHER fresh checkpoint reprocesses everything from batch 0;
    // without clearing, run 1's leaf 1 would stay and x would double
    drain(in, lake, Files.createTempDirectory("pa_ck4b"))
    val merged = PartialAggs.readMerged(spark, spec, lake)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(merged === Seq(("x", 2L, 3L)))
  }

  test("restart discipline resolves through the Hadoop FileSystem (file: URI lake)") {
    // the lake and checkpoints are addressed by URI, not a bare local
    // path — the shape an HDFS/S3 deployment uses. java.nio sees no
    // directory behind "file:/..." (Paths.get treats it as a literal
    // relative name), so the pre-port probe+cleanup silently no-opped
    // and run 2 double-counted run 1's stale leaf; the Hadoop
    // FileSystem resolves the URI and clears it.
    val in = Files.createTempDirectory("pa_in6")
    val lake = "file:" + Files.createTempDirectory("pa_lake6").toString + "/t"
    writeRows(in, "a.json", Seq(("x", 1L)))
    writeRows(in, "b.json", Seq(("x", 2L)))
    def drainUri(ckpt: String): Long = {
      val stream = spark.readStream
        .schema("k STRING, v LONG")
        .option("maxFilesPerTrigger", 1)
        .json(in.toString)
      PartialAggs.writePartials(stream, spec, lake, ckpt)
    }
    drainUri("file:" + Files.createTempDirectory("pa_ck6a").toString)
    // a second FRESH checkpoint reprocesses from batch 0: stale-leaf
    // cleanup must fire through the FileSystem-resolved URI
    drainUri("file:" + Files.createTempDirectory("pa_ck6b").toString)
    val merged = PartialAggs.readMerged(spark, spec, lake)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(merged === Seq(("x", 2L, 3L)),
      "URI-addressed lake double-counted: stale-leaf cleanup did not " +
        "resolve through the Hadoop FileSystem")
  }

  test("compactPartials: readMerged invariant, leaves consolidated") {
    val in = Files.createTempDirectory("pa_in5")
    val lake = Files.createTempDirectory("pa_lake5").toString + "/t"
    val ckpt = Files.createTempDirectory("pa_ckpt5")
    writeRows(in, "a.json", Seq(("x", 1L), ("y", 10L)))
    writeRows(in, "b.json", Seq(("y", 7L), ("z", 100L)))
    writeRows(in, "c.json", Seq(("x", -5L), ("z", 4L)))
    writeRows(in, "d.json", Seq(("x", 2L)))
    val batches = drain(in, lake, ckpt)
    assert(batches === 4)
    val before = PartialAggs.readMerged(spark, spec, lake)
      .orderBy("k").collect().map(_.toSeq).toSeq

    val (nBefore, nAfter) =
      PartialAggs.compactPartials(spark, spec, lake, keepLast = 1)
    assert(nBefore === 4 && nAfter === 2) // 3 absorbed → 1, newest kept

    val after = PartialAggs.readMerged(spark, spec, lake)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(after === before)

    // the consolidated leaf carries the smallest absorbed id; the
    // kept newest leaf is untouched — replay of the newest batch into
    // its own leaf (same deterministic partial → same bytes) stays
    // idempotent after compaction
    val ids = spark.read.option("basePath", lake).parquet(lake)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids === Array(0L, 3L))
    val leaf3 = spark.read.parquet(s"$lake/batch_id=3").collect().toSeq
    spark.createDataFrame(
        spark.sparkContext.parallelize(leaf3),
        spark.read.parquet(s"$lake/batch_id=3").schema)
      .write.mode("overwrite").parquet(s"$lake/batch_id=3")
    val replayed = PartialAggs.readMerged(spark, spec, lake)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(replayed === before)

    // compacting an already-compact lake is a no-op
    assert(PartialAggs.compactPartials(spark, spec, lake) === ((2L, 2L)))
  }

  /** Build a 3-batch lake and return (lake, the pre-crash merged answer). */
  private def crashFixture(tag: String): (String, Seq[Seq[Any]]) = {
    val in = Files.createTempDirectory("pa_in_" + tag)
    val lake = Files.createTempDirectory("pa_lake_" + tag).toString + "/t"
    val ckpt = Files.createTempDirectory("pa_ckpt_" + tag)
    writeRows(in, "a.json", Seq(("x", 1L)))
    writeRows(in, "b.json", Seq(("x", 2L)))
    writeRows(in, "c.json", Seq(("x", 4L)))
    assert(drain(in, lake, ckpt) === 3)
    (lake, PartialAggs.readMerged(spark, spec, lake)
      .collect().map(_.toSeq).toSeq)
  }

  /** A predecessor pass that wrote tmp + committed the manifest for
    * leaves 0 and 1, then crashed somewhere in steps 3–4.
    */
  private def committedTmp(lake: String): org.apache.hadoop.fs.Path = {
    val tmp = new org.apache.hadoop.fs.Path(lake + ".compact_tmp")
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spec.merge(spark.read.parquet(s"$lake/batch_id=0", s"$lake/batch_id=1"))
      .write.mode("overwrite").parquet(tmp.toString)
    PartialAggs.writeManifest(fs, tmp, Seq(0L, 1L))
    tmp
  }

  test("compactPartials: crash mid-tmp-write (no manifest) discards tmp, " +
      "leaves intact") {
    val (lake, before) = crashFixture("cw1")
    // a half-written tmp: parquet part-files may be partial garbage and
    // there is no manifest — every source leaf is still present
    val tmp = java.nio.file.Paths.get(lake + ".compact_tmp")
    java.nio.file.Files.createDirectories(tmp)
    Files.writeString(tmp.resolve("part-00000.parquet"), "torn write")
    val (nBefore, nAfter) = PartialAggs.compactPartials(spark, spec, lake)
    assert(nBefore === 3 && nAfter === 2)
    assert(PartialAggs.readMerged(spark, spec, lake)
      .collect().map(_.toSeq).toSeq === before)
    assert(!java.nio.file.Files.exists(tmp))
  }

  test("compactPartials: crash after manifest commit, before deletes — " +
      "recovery does not double-count the still-present leaves") {
    val (lake, before) = crashFixture("cw2")
    // predecessor committed the manifest but died before deleting leaves
    // 0/1: both the merged tmp AND the originals exist — the exact
    // double-count window
    val tmp = committedTmp(lake)
    val (nBefore, nAfter) = PartialAggs.compactPartials(spark, spec, lake)
    // recovery promotes tmp over leaves 0+1 → lake is {0 (merged), 2};
    // already compact at keepLast=1, nothing further absorbed
    assert(nBefore === 2 && nAfter === 2)
    assert(PartialAggs.readMerged(spark, spec, lake)
      .collect().map(_.toSeq).toSeq === before)
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(tmp))
    // marker cleaned out of the promoted leaf
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$lake/batch_id=0/${PartialAggs.ManifestName}")))
  }

  test("compactPartials: crash after deletes, before rename — recovery " +
      "promotes the committed tmp, no mass lost") {
    val (lake, before) = crashFixture("cw3")
    val tmp = committedTmp(lake)
    val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$lake/batch_id=0"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$lake/batch_id=1"), true)
    val (nBefore, nAfter) = PartialAggs.compactPartials(spark, spec, lake)
    assert(nBefore === 2 && nAfter === 2)
    assert(PartialAggs.readMerged(spark, spec, lake)
      .collect().map(_.toSeq).toSeq === before)
    assert(!fs.exists(tmp))
  }

  test("restart on a shared checkpoint folds only NEW files into the lake") {
    val in = Files.createTempDirectory("pa_in3")
    val lake = Files.createTempDirectory("pa_lake3").toString + "/t"
    val ckpt = Files.createTempDirectory("pa_ckpt3")
    writeRows(in, "a.json", Seq(("x", 5L)))
    drain(in, lake, ckpt)
    writeRows(in, "b.json", Seq(("x", 7L)))
    drain(in, lake, ckpt) // same checkpoint: a.json must not re-fold
    val merged = PartialAggs.readMerged(spark, spec, lake)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(merged === Seq(("x", 2L, 12L)))
  }
}
