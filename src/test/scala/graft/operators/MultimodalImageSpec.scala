package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.{MediaMeta, MediaRow}

/** Real-codec tests: [[Multimodal.ImageIoDecoder]] /
  * [[Multimodal.ImageIoResizer]] decode and resize genuine PNG payloads
  * with JDK-only APIs — the decoded dimensions come from the pixels, not
  * the claimed metadata, and resize → re-decode round-trips exactly.
  */
class MultimodalImageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A deterministic gradient PNG: pixel (x,y) = rgb(f(x), g(y), x^y). */
  private def gradientPng(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255 / math.max(1, w - 1) + seed) % 256
      val g = (y * 255 / math.max(1, h - 1) + 2 * seed) % 256
      val b = (x ^ y) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("ImageIoDecoder reads true dimensions from a real PNG (metadata lies)") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, gradientPng(40, 24, 0), MediaMeta("image/png", 999, 777)),
      MediaRow(2L, gradientPng(17, 31, 5), MediaMeta("image/png", 1, 1)))
    val media = rows.toDF()
    val feats = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .collect().map(f => f.id -> f).toMap
    assert(feats(1L).width == 40 && feats(1L).height == 24)
    assert(feats(2L).width == 17 && feats(2L).height == 31)
    assert(feats(1L).n_bytes == rows.head.media.length.toLong)
    assert(feats(1L).mean_byte > 0.0 && feats(1L).mean_byte < 255.0)
    // deterministic: same payload, same features (incl. the perceptual hash)
    val again = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .collect().map(f => f.id -> f).toMap
    assert(again == feats)
  }

  test("aHash: identical pixels hash identically; a crop-resize stays close") {
    import spark.implicits._
    val png = gradientPng(64, 64, 3)
    val media = Seq(
      MediaRow(1L, png, MediaMeta("image/png", 64, 64)),
      MediaRow(2L, png.clone(), MediaMeta("image/png", 64, 64))).toDF()
    val f = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .collect().map(x => x.id -> x.phash).toMap
    assert(f(1L) == f(2L), "identical images must share the perceptual hash")
    // a downscaled copy of the same image keeps most aHash bits (that is
    // the point of a perceptual hash vs a content hash)
    val small = Multimodal.resizeAll(
      Seq(MediaRow(3L, png, MediaMeta("image/png", 64, 64))).toDF(),
      32, 32, Multimodal.ImageIoResizer).toDF()
    val fs = Multimodal.extractFeatures(small, Multimodal.ImageIoDecoder)
      .collect().head
    val hamming = java.lang.Long.bitCount(fs.phash ^ f(1L))
    assert(hamming <= 12, s"downscale moved $hamming aHash bits (> 12)")
  }

  test("ImageIoResizer: resized PNG re-decodes at exactly the target size") {
    import spark.implicits._
    val media = Seq(
      MediaRow(7L, gradientPng(40, 24, 1), MediaMeta("image/png", 40, 24)))
      .toDF()
    val resized = Multimodal.resizeAll(media, 16, 10, Multimodal.ImageIoResizer)
      .collect().head
    assert(resized.meta == MediaMeta("image/png", 16, 10))
    val img = ImageIO.read(new java.io.ByteArrayInputStream(resized.media))
    assert(img.getWidth == 16 && img.getHeight == 10)
  }
}
