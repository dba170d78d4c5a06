package graft.tools

import java.awt.image.BufferedImage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Scale evidence for the multimodal surface: REAL PNG decode +
  * perceptual-hash + bilinear resize throughput through the
  * partition-local `mapPartitions` pipeline (the Scala analogue of a
  * pandas-batch UDF), at 10⁴ and 10⁵ images, local[16]. The claims
  * under test:
  *
  *  1. decode is embarrassingly parallel — images/s scales with the
  *     image count (per-image cost flat), no shuffle anywhere in the
  *     decode or resize plan;
  *  2. the real `javax.imageio` codec path (not the deterministic
  *     fake) sustains production-relevant throughput on genuine PNG
  *     payloads.
  *
  * Payloads are real 64×64 PNGs generated once per partition from the
  * row id (deterministic gradient + id-seeded pixels, so every image
  * is distinct and genuinely decoded).
  */
object MediaScaleProfile {
  /** A real, distinct 64×64 PNG for row `id`. */
  def png(id: Long): Array[Byte] = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 64) {
      var x = 0
      while (x < 64) {
        val v = (x * 4 + y * 4 + (id * 2654435761L % 251L)).toInt & 0xFF
        img.setRGB(x, y, (v << 16) | ((255 - v) << 8) | ((id % 255L).toInt))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (n <- Seq(10000L, 100000L)) {
      val media = spark.range(n).as[Long].mapPartitions(_.map { id =>
        (id, png(id), ("image/png", 64, 64))
      }).toDF("id", "media", "meta")
        .select(col("id"), col("media"), struct(
          col("meta._1").as("mime"), col("meta._2").as("width"),
          col("meta._3").as("height")).as("meta"))
        .persist()
      media.count(): Unit
      val t0 = System.nanoTime()
      val feats = Multimodal.extractFeatures(media,
        Multimodal.ImageIoDecoder)
      val nf = feats.filter(f => f.width == 64 && f.phash != 0L).count()
      val decSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val resized = Multimodal.resizeAll(media, 16, 16,
        Multimodal.ImageIoResizer)
      val nr = resized.count()
      val rszSec = (System.nanoTime() - t1) / 1e9
      println(f"[media] n=$n%7d  decode+phash=$decSec%6.1f s " +
        f"(${(n / decSec).toLong}%6d img/s)  resize64->16=$rszSec%6.1f s " +
        f"(${(n / rszSec).toLong}%6d img/s)  decoded=$nf%7d resized=$nr%7d")
      media.unpersist(blocking = false)
    }
    spark.stop()
  }
}
