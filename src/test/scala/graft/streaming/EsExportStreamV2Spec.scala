package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The es-export connector's MICRO_BATCH_READ path: the streaming twin
  * of the reference's `search_after` incremental-pull loop
  * (`ElasticSearch ETL.py:220-267`), re-expressed as a DSv2
  * MicroBatchStream whose offset is a file-index into the sorted export
  * listing. Pinned here: batch boundaries (new files only), restart
  * exactly-once accounting against a shared checkpoint, pushdown on the
  * streaming path, and the Q7 empty-page hazard (an empty page advances
  * the offset instead of wedging the loop).
  */
class EsExportStreamV2Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType)))

  private def writePage(dir: Path, n: Int, ids: Seq[Long]): Unit = {
    val hits = ids.map(id =>
      s"""{"_id":"$id","sort":[$id],"_source":{"doc_id":$id,"lang":"en"}}""")
    Files.writeString(dir.resolve(f"page-$n%04d.json"),
      s"""{"took":1,"hits":{"total":{"value":${ids.size}},
         |"hits":[${hits.mkString(",")}]}}""".stripMargin)
  }

  /** Drain all currently-available files through a shared checkpoint into
    * a per-run buffer via foreachBatch (the fault-tolerant restartable
    * sink shape [[ExportStream]] uses); returns the doc_ids THIS run
    * processed.
    */
  private def drain(dir: Path, checkpoint: Path): Seq[Long] = {
    val seen = collection.mutable.ArrayBuffer.empty[Long]
    val stream = spark.readStream.format("es-export")
      .schema(docSchema).load(dir.toString)
      .filter(col("doc_id") > 0L)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val ids = batch.select("doc_id").collect().map(_.getLong(0))
          seen.synchronized { seen ++= ids }
          ()
      }
      .start()
    try q.awaitTermination() finally q.stop()
    seen.toSeq.sorted
  }

  test("incremental pull: restart reads only new pages, exactly once") {
    val dir = Files.createTempDirectory("es_stream_pages_")
    val ckpt = Files.createTempDirectory("es_stream_ckpt_")
    writePage(dir, 1, Seq(1L, 2L))
    writePage(dir, 2, Seq(3L))

    assert(drain(dir, ckpt) === Seq(1L, 2L, 3L))

    // new pages appear (the next search_after fetches); a restarted run
    // against the SAME checkpoint must pick up exactly the new files —
    // pages 1-2 are never re-read, 3-4 appear exactly once.
    writePage(dir, 3, Seq(4L))
    writePage(dir, 4, Seq(5L, 6L))
    assert(drain(dir, ckpt) === Seq(4L, 5L, 6L))

    // third restart with nothing new: zero rows
    assert(drain(dir, ckpt) === Seq.empty)
  }

  test("empty page (quirk Q7) advances the offset instead of wedging") {
    val dir = Files.createTempDirectory("es_stream_empty_")
    val ckpt = Files.createTempDirectory("es_stream_empty_ckpt_")
    writePage(dir, 1, Seq(1L))
    writePage(dir, 2, Seq.empty) // zero hits — the reference's loop hazard
    writePage(dir, 3, Seq(2L))
    assert(drain(dir, ckpt) === Seq(1L, 2L))
    // the empty page is committed: a restart re-reads nothing
    assert(drain(dir, ckpt) === Seq.empty)
  }

  test("a page sorting into the committed prefix fails loudly") {
    val dir = Files.createTempDirectory("es_stream_anchor_")
    val ckpt = Files.createTempDirectory("es_stream_anchor_ckpt_")
    writePage(dir, 1, Seq(1L))
    writePage(dir, 3, Seq(2L))
    assert(drain(dir, ckpt) === Seq(1L, 2L))
    // a retried export writes page-0002 AFTER page-0003 was committed —
    // it sorts INTO the committed prefix, silently shifting every file
    // index (page-0003 would be re-read as "new"); the name-anchored
    // offset must refuse to mis-count rather than duplicate documents
    writePage(dir, 2, Seq(9L))
    val ex = intercept[Exception] { drain(dir, ckpt) }
    def messages(t: Throwable): String =
      if (t == null) ""
      else Option(t.getMessage).getOrElse("") + "\n" + messages(t.getCause)
    assert(messages(ex).contains("listing shifted"))
  }

  test("streaming scan keeps the batch reader's pruning and pushdown") {
    val dir = Files.createTempDirectory("es_stream_push_")
    writePage(dir, 1, Seq(1L, 2L, 3L))
    val stream = spark.readStream.format("es-export")
      .schema(docSchema).load(dir.toString)
      .filter(col("doc_id") >= 2L).select("doc_id")
    val q = stream.writeStream.format("memory").queryName("es_stream_push")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    assert(spark.table("es_stream_push").collect()
      .map(_.getLong(0)).toSeq.sorted === Seq(2L, 3L))
  }
}
