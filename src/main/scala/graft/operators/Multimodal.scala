package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with a decode/feature-extract stage.
  *
  * The Spark-side shape is the real contract — schema
  * `(id, media: binary, meta: struct<mime,width,height>)`, partition-local
  * batch processing, deterministic outputs. The actual codec is stubbed
  * behind [[MediaDecoder]] (image/audio libraries are not in this
  * environment); [[FakeDecoder]] is a deterministic stand-in so the
  * pipeline is testable end-to-end. Swapping in a real JNI/JavaCV decoder
  * changes one binding, not the plan.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int)
  final case class MediaRow(id: Long, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, n_bytes: Long, mean_byte: Double,
      phash: Long)

  /** Decode + feature-extract contract; implementations must be pure. */
  trait MediaDecoder extends Serializable {
    def features(row: MediaRow): MediaFeatures
  }

  /** Deterministic stand-in for a real image decoder: byte statistics and
    * a splitmix-mixed content hash in place of a perceptual hash.
    */
  object FakeDecoder extends MediaDecoder {
    def features(row: MediaRow): MediaFeatures = {
      val bytes = row.media
      var sum = 0L
      var h = 0xCBF29CE484222325L
      var i = 0
      while (i < bytes.length) {
        sum += bytes(i) & 0xFF
        h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L
        i += 1
      }
      MediaFeatures(row.id, bytes.length.toLong,
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, h)
    }
  }

  /** Build a media table from the documents table (text bytes standing in
    * for image payloads; metadata derived deterministically).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("image/png").as("mime"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"))
        .as("meta"))

  /** Partition-local decode: the Scala analogue of a pandas-batch UDF —
    * one decoder instance per partition, streaming rows through it (no
    * per-row setup, no driver involvement).
    */
  def extractFeatures(media: DataFrame,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map(decoder.features)
    }
  }

  /** Resize contract: decode → scale → re-encode, implementations pure.
    * [[FakeResizer]] is the deterministic stand-in (byte resampling in
    * place of pixel resampling): output length scales with the target
    * area, metadata carries the new dimensions — the schema/partitioning
    * shape a real codec plugs into.
    */
  trait MediaResizer extends Serializable {
    def resize(row: MediaRow, w: Int, h: Int): MediaRow
  }

  object FakeResizer extends MediaResizer {
    def resize(row: MediaRow, w: Int, h: Int): MediaRow = {
      val srcArea = math.max(1, row.meta.width * row.meta.height)
      val outLen = math.max(1,
        (row.media.length.toLong * (w.toLong * h) / srcArea).toInt)
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) {
        // nearest-neighbor byte resampling: deterministic, content-derived
        out(i) = row.media(((i.toLong * row.media.length) / outLen).toInt)
        i += 1
      }
      MediaRow(row.id, out, MediaMeta(row.meta.mime, w, h))
    }
  }

  def resizeAll(media: DataFrame, w: Int, h: Int,
      resizer: MediaResizer = FakeResizer): Dataset[MediaRow] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(r => resizer.resize(r, w, h)))
  }

  final case class Frame(id: Long, frame_no: Int, phash: Long)

  /** Frame sampling for video-shaped payloads: every `stride`-th fixed-size
    * chunk of the payload stands in for a decoded frame; each sampled
    * frame gets a content hash. One row in → N frame rows out
    * (flatMap-shaped, so a 2-hour video never materializes as one task's
    * memory: chunks stream through the iterator).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
      stride: Int = 4): Dataset[Frame] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { row =>
      val nFrames = math.max(1, row.media.length / frameBytes)
      (0 until nFrames by stride).iterator.map { f =>
        var h = 0xCBF29CE484222325L
        val start = f * frameBytes
        val end = math.min(start + frameBytes, row.media.length)
        var i = start
        while (i < end) {
          h = (h ^ (row.media(i) & 0xFFL)) * 0x100000001B3L
          i += 1
        }
        Frame(row.id, f, h)
      }
    }
  }
}
