package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Int8 quantization invariants: hand-computed codes on a known vector,
  * the clamp engaging at exactly ±127, the all-zero-vector guard, and
  * the dequantization error bound (≤ scale/2 everywhere, by the
  * definition of round-to-nearest on unclamped codes).
  */
class QuantizationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("id", "vec")
  }

  test("hand-computed codes on a known vector") {
    // maxabs 2.54 → scale 0.02; codes round(x/0.02); values chosen
    // away from .5 quotient boundaries (float noise would make the
    // round direction platform-dependent there)
    val d = df((1L, Seq(2.54f, -1.0f, 0.3f, 0.0f, -2.54f)))
    val r = Quantization.int8(d, "vec").select("q_scale", "q_vec").head()
    assert(math.abs(r.getDouble(0) - 0.02) < 1e-8)
    assert(r.getSeq[Byte](1) == Seq[Byte](127, -50, 15, 0, -127),
      r.getSeq[Byte](1).toString)
  }

  test("all-zero vector quantizes to zeros with scale 0, no NaN") {
    val d = df((1L, Seq(0.0f, 0.0f, 0.0f)))
    val r = Quantization.int8(d, "vec").select("q_scale", "q_vec").head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getSeq[Byte](1) == Seq[Byte](0, 0, 0))
    // and int8Stats excludes it rather than emitting NaN rows
    assert(Quantization.int8Stats(d, "id", "vec").count() == 0)
  }

  test("dequantization error is bounded by scale/2 on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 50L).map(i =>
      (i, Seq.fill(64)((rnd.nextFloat() - 0.5f) * 4f)))
    val stats = Quantization.int8Stats(df(rows: _*), "id", "vec")
      .withColumn("bound", col("scale6") / 2 + lit(1e-6))
    assert(stats.count() == 50)
    assert(stats.filter(col("max_err6") > col("bound")).count() == 0)
  }

  test("integer invariants match a driver-side recomputation") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 20L).map(i =>
      (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 2f)))
    val got = Quantization.int8Stats(df(rows: _*), "id", "vec")
      .select("id", "sum_q", "n_zero").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // half-away-from-zero, matching Spark's HALF_UP (Math.round is
    // half-toward-+inf — wrong for negative exact halves)
    def rnd0(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    rows.foreach { case (id, vec) =>
      val scale = vec.map(v => math.abs(v.toDouble)).max / 127.0
      val q = vec.map(v => math.max(-127L, math.min(127L,
        rnd0(v.toDouble / scale))))
      assert(got(id) == ((q.sum, q.count(_ == 0L).toLong)), s"id $id")
    }
  }
}
