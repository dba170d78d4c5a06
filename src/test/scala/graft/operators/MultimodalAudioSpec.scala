package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.AudioRow

/** WAV/RIFF PCM codec: canonical encode → chunk-walking decode round trip,
  * tolerance for real-world chunk layouts (LIST before data), exact
  * integer energy statistics, and loud failure on non-PCM payloads.
  */
class MultimodalAudioSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("encode/decode round trip reproduces exact energy statistics") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val f = Multimodal.wavDecode(1L, Multimodal.wavEncode(samples, 8000))
    assert(f.sample_rate == 8000L)
    assert(f.n_channels == 1L)
    assert(f.n_samples == samples.length.toLong)
    assert(f.sum_sq == samples.map(x => x.toLong * x).sum)
    assert(f.peak == 32768L)
    assert(f.duration_ms == samples.length * 1000L / 8000)
  }

  test("decoder walks chunk lists: a LIST chunk before data is skipped") {
    val base = Multimodal.wavEncode(Array[Short](5, -5, 9), 16000)
    // splice an 11-byte LIST chunk (odd length — exercises word-align
    // padding) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val listBody = "INFOsoftwar".getBytes("US-ASCII")
    val buf = java.nio.ByteBuffer
      .allocate(base.length + 8 + listBody.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(base, 0, fmtEnd)
    buf.put("LIST".getBytes("US-ASCII")).putInt(listBody.length)
    buf.put(listBody).put(0.toByte) // pad byte
    buf.put(base, fmtEnd, base.length - fmtEnd)
    val bytes = buf.array()
    // fix the RIFF size field (bytes 4-7) for the inserted chunk
    val riffLen = bytes.length - 8
    bytes(4) = (riffLen & 0xFF).toByte
    bytes(5) = ((riffLen >> 8) & 0xFF).toByte
    bytes(6) = ((riffLen >> 16) & 0xFF).toByte
    bytes(7) = ((riffLen >> 24) & 0xFF).toByte
    val f = Multimodal.wavDecode(2L, bytes)
    assert(f.sample_rate == 16000L)
    assert(f.n_samples == 3L)
    assert(f.sum_sq == 25L + 25L + 81L)
    assert(f.peak == 9L)
  }

  test("non-RIFF and non-PCM payloads fail loudly, naming the id") {
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.wavDecode(7L, "not a wav at all".getBytes)
    }
    assert(e1.getMessage.contains("7"))
    val bad = Multimodal.wavEncode(Array[Short](1), 8000)
    bad(20) = 3 // fmt code 3 = IEEE float, not PCM
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.wavDecode(8L, bad)
    }
    assert(e2.getMessage.contains("non-PCM"))
  }

  test("a negative chunk length is rejected, not an infinite loop") {
    // craft a WAV whose post-fmt chunk declares a high-bit (negative int)
    // size: an unguarded walk would move the cursor BACKWARDS and spin
    // forever; the decoder must treat it as undecodable instead.
    val base = Multimodal.wavEncode(Array[Short](1, 2), 8000)
    val fmtEnd = 12 + 8 + 16
    val buf = java.nio.ByteBuffer.allocate(fmtEnd + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(base, 0, fmtEnd)
    buf.put("junk".getBytes("US-ASCII")).putInt(0x80000004) // len < 0
    val e = intercept[IllegalArgumentException] {
      Multimodal.wavDecode(9L, buf.array())
    }
    assert(e.getMessage.contains("negative chunk length"))
    assert(e.getMessage.contains("9"))
    // and the lenient pass DROPS the row (the degradation contract) —
    // before the guard this hung the task instead
    import spark.implicits._
    val rows = Seq(AudioRow(1L, base), AudioRow(9L, buf.array())).toDS()
    val out = Multimodal.audioFeaturesLenient(rows).collect()
    assert(out.map(_.id).toSeq.sorted == Seq(1L))
  }

  test("lenient decode drops corrupt payloads, keeps valid ones") {
    import spark.implicits._
    val good = Multimodal.wavEncode(Array[Short](3, -4), 8000)
    val truncated = good.take(30) // cut mid-fmt
    val garbage = "definitely not audio".getBytes
    val rows = Seq(AudioRow(1L, good), AudioRow(2L, truncated),
      AudioRow(3L, garbage)).toDS()
    val out = Multimodal.audioFeaturesLenient(rows).collect()
    assert(out.map(_.id).toSeq == Seq(1L), out.mkString(","))
    assert(out.head.sum_sq == 25L)
    // and the strict variant fails loudly on the same corpus
    intercept[org.apache.spark.SparkException] {
      Multimodal.audioFeatures(rows).collect()
    }
  }

  test("audioTable -> audioFeatures runs distributed and matches the recurrence") {
    import spark.implicits._
    val docs = Seq((0L, "a"), (3L, "b"), (42L, "c"))
      .toDF("doc_id", "text")
    val feats = Multimodal.audioFeatures(Multimodal.audioTable(docs))
      .collect().map(f => f.id -> f).toMap
    assert(feats.keySet == Set(0L, 3L, 42L))
    feats.foreach { case (id, f) =>
      val n = (800 + id % 100).toInt
      val xs = (0 until n).map(i => ((id * 31 + i.toLong * 7) % 65536) - 32768)
      assert(f.n_samples == n.toLong, s"id $id")
      assert(f.sum_sq == xs.map(x => x * x).sum, s"id $id")
      assert(f.peak == xs.map(math.abs).max, s"id $id")
      assert(f.duration_ms == n * 1000L / 8000, s"id $id")
    }
  }
}
