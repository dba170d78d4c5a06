package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Real frame sampling: a multi-frame GIF (the animated container the JDK
  * decodes natively) is decoded frame-by-frame via `ImageReader`, and each
  * sampled frame carries the same 8×8 aHash a standalone still of that
  * frame would get; opaque (non-GIF) payloads keep the byte-chunk model.
  */
class MultimodalGifSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Frame k: a black/white split whose orientation depends on k — the
    * three patterns have pairwise-distinct aHash bit layouts (unlike
    * solid colors, which all hash to the same all-ones aHash).
    */
  private def frame(k: Int, w: Int = 32, h: Int = 32): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val white = k % 3 match {
        case 0 => x >= w / 2          // left black / right white
        case 1 => y >= h / 2          // top black / bottom white
        case _ => x > y               // diagonal split
      }
      img.setRGB(x, y, if (white) 0xFFFFFF else 0x000000)
    }
    img
  }

  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(f, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  test("multi-frame GIF: every real frame decoded, hashes match stills") {
    import spark.implicits._
    val frames = Seq(frame(0), frame(1), frame(2))
    val gif = animatedGif(frames)
    val media = Seq(
      MediaRow(7L, gif, MediaMeta("image/gif", 32, 32))).toDF()
    val got = Multimodal.sampleFrames(media, stride = 1)
      .collect().sortBy(_.frame_no)
    assert(got.map(_.frame_no).toSeq == Seq(0, 1, 2),
      "one output row per real GIF frame")
    // each sampled frame hashes exactly as the standalone still would
    got.zip(frames).foreach { case (f, img) =>
      assert(f.phash == Multimodal.aHash(img),
        s"frame ${f.frame_no} hash != still-image aHash")
    }
    assert(got.map(_.phash).distinct.length == 3,
      "the three patterns must have distinct perceptual hashes")
  }

  test("stride samples every stride-th GIF frame") {
    import spark.implicits._
    val gif = animatedGif(Seq(frame(0), frame(1), frame(2), frame(0)))
    val media = Seq(
      MediaRow(8L, gif, MediaMeta("image/gif", 32, 32))).toDF()
    val got = Multimodal.sampleFrames(media, stride = 2)
      .collect().sortBy(_.frame_no)
    assert(got.map(_.frame_no).toSeq == Seq(0, 2))
  }

  test("corrupt GIF payload degrades to byte chunks instead of failing the job") {
    import spark.implicits._
    // 'GIF8' magic followed by garbage: ImageIO either finds no reader or
    // throws mid-decode; the row must fall back to chunk hashing, and
    // healthy rows in the same pass must still decode for real
    val corrupt = ("GIF89a".getBytes("US-ASCII") ++
      Array.tabulate(250)(i => (i * 17 + 3).toByte))
    val healthy = animatedGif(Seq(frame(0), frame(1)))
    val media = Seq(
      MediaRow(10L, corrupt, MediaMeta("image/gif", 0, 0)),
      MediaRow(11L, healthy, MediaMeta("image/gif", 32, 32))).toDF()
    val got = Multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
      .collect().groupBy(_.id)
    // corrupt: 256 bytes / 64 per chunk = 4 chunk-frames
    assert(got(10L).map(_.frame_no).sorted.toSeq == Seq(0, 1, 2, 3),
      got(10L).mkString(","))
    // healthy: both real frames, hashed as stills
    assert(got(11L).map(_.frame_no).sorted.toSeq == Seq(0, 1))
    assert(got(11L).sortBy(_.frame_no).map(_.phash).toSeq ==
      Seq(Multimodal.aHash(frame(0)), Multimodal.aHash(frame(1))))
  }

  test("opaque payloads keep the byte-chunk frame model") {
    import spark.implicits._
    val blob = Array.tabulate(256)(i => (i * 31).toByte) // not a GIF
    val media = Seq(
      MediaRow(9L, blob, MediaMeta("video/mp4", 0, 0))).toDF()
    val got = Multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
      .collect().sortBy(_.frame_no)
    assert(got.map(_.frame_no).toSeq == Seq(0, 1, 2, 3))
    assert(got.map(_.phash).distinct.length == 4)
  }
}
