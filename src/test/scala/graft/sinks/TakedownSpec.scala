package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Takedown / right-to-erasure deletion ([[Lake.deleteIds]]) and its
  * propagation through derived state ([[Similarity.deleteFromIvfLake]],
  * [[Dedup.deleteFromNearDupState]]). Pinned: only affected partitions
  * are rewritten (untouched partitions keep their exact files),
  * fully-deleted partitions become empty but the lake stays readable,
  * crash recovery completes a committed pass and discards an
  * uncommitted one, ANN sidecars and probe geometry survive, and
  * post-delete near-dup matching equals matching against a state
  * rebuilt from the surviving corpus.
  */
class TakedownSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docLake(dir: String): Unit =
    (0L until 40L).map(i => (i, s"src${(i % 4)}", s"text of doc $i"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").partitionBy("source").parquet(dir)

  private def leafFiles(dir: String, leaf: String): Set[String] =
    Option(new java.io.File(s"$dir/$leaf").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(f => f.getName + ":" + f.lastModified()).toSet

  test("deleteIds: only affected partitions rewritten; survivors byte-stable") {
    val dir = Files.createTempDirectory("takedown_lake_").toString + "/t"
    docLake(dir)
    // ids 1 and 5 live in src1; 2 in src2 — src0/src3 must be untouched
    val untouched0 = leafFiles(dir, "source=src0")
    val untouched3 = leafFiles(dir, "source=src3")
    val (parts, removed) = Lake.deleteIds(spark, dir, "source", "doc_id",
      Seq(1L, 5L, 2L, 999L).toDF("doc_id"))
    assert(parts === 2L && removed === 3L)
    assert(leafFiles(dir, "source=src0") === untouched0,
      "unaffected partition src0 was rewritten")
    assert(leafFiles(dir, "source=src3") === untouched3,
      "unaffected partition src3 was rewritten")
    val back = spark.read.parquet(dir)
    assert(back.count() === 37L)
    assert(back.filter(col("doc_id").isin(1L, 5L, 2L)).count() === 0L)
    // survivors in rewritten partitions keep their full content
    val row = back.filter(col("doc_id") === 9L).collect()(0)
    assert(row.getAs[String]("text") === "text of doc 9" &&
      row.getAs[String]("source") === "src1")
  }

  test("deleteIds: fully-deleted partition empties; lake stays readable") {
    val dir = Files.createTempDirectory("takedown_full_").toString + "/t"
    docLake(dir)
    val allSrc2 = (0L until 40L).filter(_ % 4 == 2)
    val (parts, removed) = Lake.deleteIds(spark, dir, "source", "doc_id",
      allSrc2.toDF("doc_id"))
    assert(parts === 1L && removed === allSrc2.size.toLong)
    val back = spark.read.parquet(dir)
    assert(back.count() === 30L)
    assert(back.filter(col("source") === "src2").count() === 0L)
    // the empty replacement leaf exists (uniform promote contract) but
    // contributes no rows and no partition value
    assert(new java.io.File(s"$dir/source=src2").isDirectory)
  }

  test("deleteIds: no matching id is a no-op") {
    val dir = Files.createTempDirectory("takedown_noop_").toString + "/t"
    docLake(dir)
    val before = (0 to 3).map(i => leafFiles(dir, s"source=src$i"))
    assert(Lake.deleteIds(spark, dir, "source", "doc_id",
      Seq(777L).toDF("doc_id")) === ((0L, 0L)))
    assert((0 to 3).map(i => leafFiles(dir, s"source=src$i")) === before)
  }

  test("deleteIds recovery: committed tmp promotes, uncommitted tmp discards") {
    val dir = Files.createTempDirectory("takedown_rec_").toString + "/t"
    docLake(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // a dead pass that COMMITTED: its tmp holds a replacement for src1
    // (doc 13 only) plus the manifest — recovery must finish the delete
    val tmp = new org.apache.hadoop.fs.Path(dir + ".takedown_tmp")
    Seq((13L, "replacement survivor"))
      .toDF("doc_id", "text").withColumn("source", lit("src1"))
      .write.partitionBy("source").parquet(tmp.toString)
    Lake.writeNameManifest(fs, tmp, Seq("source=src1"))
    val (parts, removed) = Lake.deleteIds(spark, dir, "source", "doc_id",
      Seq(777L).toDF("doc_id")) // matches nothing itself
    assert((parts, removed) === ((0L, 0L)))
    val back = spark.read.parquet(dir)
    assert(back.filter(col("source") === "src1").count() === 1L,
      "committed dead pass must be completed by recovery")
    assert(!fs.exists(tmp))

    // a dead pass that did NOT commit: junk tmp without manifest —
    // recovery discards it and the lake is untouched
    fs.mkdirs(new org.apache.hadoop.fs.Path(tmp, "source=src0"))
    Lake.deleteIds(spark, dir, "source", "doc_id", Seq(777L).toDF("doc_id"))
    assert(!fs.exists(tmp))
    assert(spark.read.parquet(dir).filter(col("source") === "src0")
      .count() === 10L, "uncommitted tmp must not change the lake")
  }

  test("deleteFromIvfLake: search equals frozen twin on survivors; sidecar intact") {
    val dim = 8
    val rnd = new scala.util.Random(7)
    val emb = (0L until 200L).map { i =>
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f).toSeq)
    }.toDF("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < 5)
    val dir = Files.createTempDirectory("takedown_ivf_").toString + "/l"
    Similarity.writeIvfLake(emb, dir, "vec_id", "embedding", dim,
      nCells = 8): Unit
    val dels = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
    val delSet = dels.as[Long].collect().toSet
    val (cells, removed) = Similarity.deleteFromIvfLake(spark, dir, dels)
    assert(removed === delSet.size.toLong && cells >= 1L)
    val post = Similarity.ivfTopKOverLake(spark, dir, qs, "vec_id",
      "embedding", dim, k = 5, nProbe = 4)
    val twin = Similarity.ivfTopKFrozen(
      emb.filter(!col("vec_id").isin(delSet.toSeq: _*)), qs, "vec_id",
      "embedding", dim, k = 5, lakeDir = dir, nProbe = 4)
    val p = post.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val t = twin.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(p === t, "post-delete lake search must equal the frozen twin")
    assert(p.forall(x => !delSet.contains(x._2)),
      "deleted ids must not appear in results")
    assert(new java.io.File(s"$dir/_ivf_centroids").isDirectory,
      "centroid sidecar must survive the takedown")
  }

  test("deleteFromNearDupState: deleted docs stop matching; state equals a rebuild") {
    val corpus = (0 until 30).map { i =>
      (i.toLong, (0 until 12).map(t => s"c${i}_$t").mkString(" "))
    }.toDF("doc_id", "text")
    // delta doc 1000+i near-dups corpus doc i for i < 6
    val delta = (0 until 6).map { i =>
      (1000L + i, (0 until 11).map(t => s"c${i}_$t").mkString(" ") + " zz")
    }.toDF("doc_id", "text")
    val dir = Files.createTempDirectory("takedown_state_").toString
    graft.streaming.NearDupStream.writeCorpusState(
      corpus, "doc_id", "text", s"$dir/state")
    val state0 = spark.read.parquet(s"$dir/state")
    val before = Dedup.nearDupsAgainstState(state0, delta, "doc_id",
      "text", threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(before.map(_._1).intersect(Set(2L, 4L)) === Set(2L, 4L))

    val removed = Dedup.deleteFromNearDupState(spark, s"$dir/state",
      Seq(2L, 4L, 999L).toDF("doc_id"))
    assert(removed === 2L)
    val state1 = spark.read.parquet(s"$dir/state")
    val after = Dedup.nearDupsAgainstState(state1, delta, "doc_id",
      "text", threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before.filterNot(p => p._1 == 2L || p._1 == 4L),
      "only the deleted docs' pairs may disappear")

    // the surviving state IS the rebuild from the surviving corpus
    val rebuilt = Dedup.nearDupState(
      corpus.filter(!col("doc_id").isin(2L, 4L)), "doc_id", "text")
    assert(state1.exceptAll(rebuilt).count() === 0L &&
      rebuilt.exceptAll(state1).count() === 0L)

    // idempotence: deleting the same ids again is a no-op
    assert(Dedup.deleteFromNearDupState(spark, s"$dir/state",
      Seq(2L, 4L).toDF("doc_id")) === 0L)
  }

  test("deleteFromNearDupState recovery: a swap killed between its two " +
      "renames restores from the backup on retry") {
    val corpus = (0 until 12).map { i =>
      (i.toLong, (0 until 12).map(t => s"r${i}_$t").mkString(" "))
    }.toDF("doc_id", "text")
    val dir = Files.createTempDirectory("takedown_recover_").toString
    graft.streaming.NearDupStream.writeCorpusState(
      corpus, "doc_id", "text", s"$dir/state")
    val liveRows = spark.read.parquet(s"$dir/state").count()
    // manufacture the mid-swap crash: live parked at the backup name
    val p = new org.apache.hadoop.fs.Path(s"$dir/state")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(p,
      new org.apache.hadoop.fs.Path(s"$dir/state.takedown_backup")))
    // the retried takedown recovers, then applies
    val removed = Dedup.deleteFromNearDupState(spark, s"$dir/state",
      Seq(3L).toDF("doc_id"))
    assert(removed === 1L)
    val back = spark.read.parquet(s"$dir/state")
    assert(back.count() === liveRows - 1L)
    assert(back.filter(col("corpus_id") === 3L).count() === 0L)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/state.takedown_backup")))
  }
}
