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
  /** `width`/`height` are the DECODED dimensions (a real decoder reads
    * them from the payload and may disagree with the claimed metadata).
    */
  final case class MediaFeatures(id: Long, n_bytes: Long, mean_byte: Double,
      phash: Long, width: Int, height: Int)

  /** Decode + feature-extract contract; implementations must be pure. */
  trait MediaDecoder extends Serializable {
    def features(row: MediaRow): MediaFeatures
  }

  /** Deterministic stand-in for a real image decoder: byte statistics and
    * a splitmix-mixed content hash in place of a perceptual hash; echoes
    * the claimed metadata dimensions (it cannot decode real ones).
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
        if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, h,
        row.meta.width, row.meta.height)
    }
  }

  /** REAL image decoder, JDK-only: `javax.imageio` handles PNG/JPEG/GIF/BMP
    * with no external dependency. Features: true decoded dimensions, mean
    * luminance (ITU-R BT.601 over all pixels), and a 64-bit average-hash
    * perceptual hash (8×8 luminance downsample thresholded at its mean —
    * the classic aHash; near-identical images differ by a few bits of
    * Hamming distance, so the SimHash-style banding used for text sketches
    * applies unchanged downstream). Pure and deterministic: ImageIO decode
    * of a given payload is bit-stable, and all statistics are computed from
    * the decoded raster, not codec internals.
    */
  object ImageIoDecoder extends MediaDecoder {
    def features(row: MediaRow): MediaFeatures = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.media))
      require(img != null, s"media id ${row.id}: undecodable image payload")
      val w = img.getWidth
      val h = img.getHeight
      var lumSum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          lumSum += luminance(img.getRGB(x, y))
          x += 1
        }
        y += 1
      }
      MediaFeatures(row.id, row.media.length.toLong,
        lumSum / (w.toLong * h), aHash(img), w, h)
    }
  }

  private[operators] def luminance(rgb: Int): Double = {
    val r = (rgb >> 16) & 0xFF
    val g = (rgb >> 8) & 0xFF
    val b = rgb & 0xFF
    0.299 * r + 0.587 * g + 0.114 * b
  }

  /** 8×8 average-hash: mean luminance per cell, bit set iff >= grid mean.
    * Shared by the still-image decoder and the GIF frame sampler so one
    * frame and its single-image re-encode hash identically.
    */
  private[operators] def aHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cells = new Array[Double](64)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8; val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
        val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
        var s = 0.0
        var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            s += luminance(img.getRGB(x, y)); n += 1; x += 1
          }
          y += 1
        }
        cells(cy * 8 + cx) = if (n == 0) 0.0 else s / n
        cx += 1
      }
      cy += 1
    }
    val mean = cells.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (cells(i) >= mean) bits |= (1L << i)
      i += 1
    }
    bits
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

  /** REAL resizer, JDK-only: decode via ImageIO, bilinear-scale through
    * Graphics2D into the target raster, re-encode as PNG (lossless, so the
    * output round-trips deterministically through [[ImageIoDecoder]]).
    */
  object ImageIoResizer extends MediaResizer {
    def resize(row: MediaRow, w: Int, h: Int): MediaRow = {
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.media))
      require(src != null, s"media id ${row.id}: undecodable image payload")
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      MediaRow(row.id, out.toByteArray, MediaMeta("image/png", w, h))
    }
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

  // --- audio: WAV/RIFF PCM codec (JDK-only, no external deps) ---------------

  final case class AudioRow(id: Long, media: Array[Byte])
  /** `sum_sq`/`peak` are exact integers over the decoded int16 samples —
    * energy statistics without float summation-order sensitivity, so a
    * DuckDB oracle can recompute them bit-for-bit.
    */
  final case class AudioFeatures(id: Long, sample_rate: Long,
      n_channels: Long, n_samples: Long, duration_ms: Long,
      sum_sq: Long, peak: Long)

  /** Encode one channel of int16 PCM as a canonical 44-byte-header WAV
    * (RIFF → fmt [PCM, mono] → data, little-endian throughout).
    */
  def wavEncode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** REAL WAV decoder: walks the RIFF chunk list (not a fixed 44-byte
    * offset — real-world WAVs carry LIST/fact chunks before data), reads
    * the fmt sample rate / channel count, and streams the int16 PCM data
    * chunk into exact integer energy statistics.
    */
  def wavDecode(id: Long, bytes: Array[Byte]): AudioFeatures = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF" && { buf.getInt; tag() == "WAVE" },
      s"audio id $id: not a RIFF/WAVE payload")
    var rate = 0L; var channels = 0L; var bits = 0
    var sumSq = 0L; var peak = 0L; var nSamples = 0L
    while (buf.remaining() >= 8) {
      val chunk = tag()
      val len = buf.getInt
      // A negative declared length (crafted/corrupt high-bit chunk size)
      // would move the cursor BACKWARDS and spin the walk forever; treat
      // it as undecodable so strict mode fails loudly and the lenient
      // wrapper drops the row instead of hanging the task.
      require(len >= 0, s"audio id $id: negative chunk length $len ('$chunk')")
      val next = buf.position() + len + (len & 1) // chunks are word-aligned
      chunk match {
        case "fmt " =>
          val fmt = buf.getShort
          require(fmt == 1, s"audio id $id: non-PCM WAV (fmt $fmt)")
          channels = buf.getShort.toLong
          rate = buf.getInt.toLong
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          require(bits == 16, s"audio id $id: only int16 PCM ($bits-bit)")
        case "data" =>
          require(rate > 0, s"audio id $id: data chunk before fmt")
          var i = 0
          while (i + 1 < len) {
            val x = buf.getShort.toLong
            sumSq += x * x
            val a = math.abs(x)
            if (a > peak) peak = a
            nSamples += 1
            i += 2
          }
        case _ => // LIST/fact/cue — skip
      }
      buf.position(math.min(next, buf.capacity()))
    }
    val frames = if (channels > 0) nSamples / channels else 0L
    AudioFeatures(id, rate, channels, nSamples,
      if (rate > 0) frames * 1000L / rate else 0L, sumSq, peak)
  }

  /** Deterministic synthetic audio table: per doc, a mono 8 kHz WAV whose
    * int16 samples follow the integer recurrence
    * `((id*31 + i*7) mod 65536) - 32768` — pure integer math an oracle
    * can replay exactly, through a REAL RIFF encode/decode round trip.
    */
  def audioTable(docs: DataFrame): Dataset[AudioRow] = {
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("id")).as[Long].map { id =>
      val n = (800 + id % 100).toInt
      val samples = Array.tabulate(n) { i =>
        (((id * 31 + i.toLong * 7) % 65536) - 32768).toShort
      }
      AudioRow(id, wavEncode(samples, 8000))
    }
  }

  /** Partition-local audio decode (same shape as [[extractFeatures]]).
    * Strict: an undecodable payload fails loudly, naming the id — the
    * right mode when the payloads are produced by a known encoder (q87).
    */
  def audioFeatures(audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    val spark: SparkSession = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.map(r => wavDecode(r.id, r.media)))
  }

  /** Crawl-tolerant variant: undecodable payloads (truncated RIFF, non-PCM
    * codecs, arbitrary bytes) are DROPPED instead of failing the pass —
    * one bad document must never kill a corpus-scale job (the same
    * degradation contract as [[sampleFrames]]'s GIF fallback). Use the
    * strict [[audioFeatures]] when the source encoder is known.
    */
  def audioFeaturesLenient(audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    val spark: SparkSession = audio.sparkSession
    import spark.implicits._
    audio.mapPartitions(_.flatMap { r =>
      try Iterator.single(wavDecode(r.id, r.media))
      catch { case scala.util.control.NonFatal(_) => Iterator.empty }
    })
  }

  final case class Frame(id: Long, frame_no: Int, phash: Long)

  /** Frame sampling for video-shaped payloads. Multi-frame GIF payloads
    * (the one animated container the JDK decodes natively) get REAL frame
    * decoding: `ImageReader.getNumImages(true)` + `read(i)` per sampled
    * frame, each hashed with the same 8×8 aHash as still images — so a
    * GIF frame and its standalone re-encode carry the same perceptual
    * hash. Opaque payloads (codecs the JVM lacks) keep the byte-chunk
    * model: every `stride`-th fixed-size chunk stands in for a frame with
    * a content hash. One row in → N frame rows out (flatMap-shaped, so a
    * 2-hour video never materializes as one task's memory: opaque chunks
    * stream through the iterator; GIF frame counts are bounded by the
    * container format itself).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
      stride: Int = 4): Dataset[Frame] = {
    val spark: SparkSession = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { row =>
      // a 'GIF8'-magic payload the JDK cannot decode (truncated/corrupt
      // crawl data, exotic encoder) degrades to chunk hashing instead of
      // killing the whole job — one bad document must never fail a
      // corpus-scale pass (gifFrames materializes its frames eagerly, so
      // every decode error surfaces inside this try)
      if (isGif(row.media))
        try gifFrames(row, stride)
        catch {
          case scala.util.control.NonFatal(_) =>
            byteChunkFrames(row, frameBytes, stride)
        }
      else byteChunkFrames(row, frameBytes, stride)
    }
  }

  /** GIF87a/GIF89a magic. */
  private def isGif(b: Array[Byte]): Boolean =
    b.length > 6 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == '8'.toByte

  private def gifFrames(row: MediaRow, stride: Int): Iterator[Frame] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(row.media))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"media id ${row.id}: no GIF reader")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        // a decodable GIF has >= 1 frame; 0/-1 means the reader bailed on
        // garbage without throwing — surface it so the caller's fallback
        // (byte-chunk frames) takes over
        require(n > 0, s"media id ${row.id}: unreadable GIF ($n frames)")
        // materialized (not lazy): the reader must be disposed before
        // return, and GIF frame counts are small by construction
        (0 until n by math.max(1, stride)).map { i =>
          Frame(row.id, i, aHash(reader.read(i)))
        }.iterator
      } finally reader.dispose()
    } finally iis.close()
  }

  private def byteChunkFrames(row: MediaRow, frameBytes: Int,
      stride: Int): Iterator[Frame] = {
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
