package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.flatten.Flattener
import graft.sources.EsJson

/** Streaming form of the export job with PER-BATCH schema semantics
  * (SURVEY.md §2.3 Q6): the reference computes the column union per
  * fetched page [`ElasticSearch ETL.py:238-240`], so TSV files from one
  * run may have different column sets. The batch `EtlJob` deliberately
  * uses ONE global schema (the better default); this job reproduces the
  * faithful per-batch behavior by treating each exported response file as
  * one micro-batch: file stream source → `foreachBatch` → flatten THAT
  * batch → one TSV named `{prefix}_{batchId}_{utc}.tsv`
  * (the reference's file-naming shape [`ETL.py:247-257`]).
  *
  * `maxFilesPerTrigger=1` maps one export file to one batch, mirroring
  * one `search_after` page per loop iteration; checkpointing gives the
  * exactly-once restart semantics the reference's client-held
  * `search_after` state approximates.
  */
object ExportStream {

  final case class BatchResult(batchId: Long, rows: Long, columns: Int,
      file: String)

  /** @param checkpointDir source-progress checkpoint. Reusing the same
    *   directory across invocations gives exactly-once file processing:
    *   a restarted job skips every export file already committed — the
    *   durable version of the reference's client-held `search_after`
    *   cursor. Default: a fresh temp dir (process everything).
    */
  def run(spark: SparkSession, inputDir: String, outputDir: String,
      filePrefix: String = "rta_claim_headers",
      maxDepth: Int = 20, checkpointDir: String = null): Seq[BatchResult] = {
    Files.createDirectories(Paths.get(outputDir))
    val checkpoint =
      if (checkpointDir != null) checkpointDir
      else Files.createTempDirectory("export_ckpt").toString
    val results = collection.mutable.ArrayBuffer.empty[BatchResult]

    // schema-of-strings source: each line is one exported response/doc;
    // parsing + inference happen per batch so each batch gets ITS OWN
    // schema union, exactly like the reference's per-page pass 1.
    val raw = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(inputDir)

    val q = raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        val lines = batch.select("value").as(
          org.apache.spark.sql.Encoders.STRING)
        if (!lines.isEmpty) {
          val docs = EsJson.unwrap(
            spark.read
              .option("inferTimestamp", false).option("inferDate", false)
              .json(lines))
          val ts = java.time.format.DateTimeFormatter
            .ofPattern("yyyyMMdd_HHmmss")
            .withZone(java.time.ZoneOffset.UTC)
            .format(java.time.Instant.now())
          val file = s"$outputDir/${filePrefix}_${batchId}_$ts.tsv"
          val tmp = file + ".dir"
          val cols = Flattener.flattenToTsv(docs, tmp, maxDepth,
            singleFile = true)
          val part = Files.list(Paths.get(tmp)).toArray
            .map(_.asInstanceOf[java.nio.file.Path])
            .find(_.getFileName.toString.startsWith("part-")).get
          Files.move(part, Paths.get(file),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          results.synchronized {
            results += BatchResult(batchId, docs.count(), cols.length, file)
          }
        }
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    results.toSeq.sortBy(_.batchId)
  }
}
