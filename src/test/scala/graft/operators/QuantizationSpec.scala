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

  test("quantized top-k preserves cluster structure vs float top-k") {
    // three tight clusters around orthogonal-ish directions: int8
    // rounding (max relative error ~0.4% per coordinate) cannot jump
    // a result ACROSS clusters, so every quantized neighbor must be
    // in the query's cluster; WITHIN a cluster siblings sit ~1e-4
    // apart in cosine, where rounding may legitimately swap the last
    // rank — so recall@5 is bounded, not pinned to 1.0
    val rnd = new scala.util.Random(13)
    def around(base: Array[Float], id: Long) =
      (id, base.toSeq.map(v => v + (rnd.nextFloat() - 0.5f) * 0.05f))
    val b1 = Array.tabulate(16)(i => if (i < 6) 1f else 0.05f)
    val b2 = Array.tabulate(16)(i => if (i >= 6 && i < 11) 1f else 0.05f)
    val b3 = Array.tabulate(16)(i => if (i >= 11) 1f else 0.05f)
    val corpus = df(
      (Seq(b1, b2, b3).zipWithIndex.flatMap { case (b, ci) =>
        (0 until 8).map(j => around(b, ci * 100L + j))
      }): _*)
    val queries = corpus.filter(col("id").isin(0L, 100L, 200L))
    val qk = Similarity.quantizedTopK(corpus, queries, "id", "vec", k = 5)
      .select("q_id", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val fk = Similarity.bruteForceTopK(corpus, queries, "id", "vec", k = 5)
      .select("q_id", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(qk.length == 15)
    qk.foreach { case (q, id) =>
      assert(q / 100 == id / 100, s"cross-cluster neighbor: ($q, $id)")
    }
    Seq(0L, 100L, 200L).foreach { q =>
      val hits = qk.filter(_._1 == q).count(fk.contains)
      assert(hits >= 4, s"recall@5 for query $q: $hits/5")
    }
  }

  test("cosineInt8 matches a driver-side integer recomputation") {
    import graft.functions.ArrayOps
    val rnd = new scala.util.Random(17)
    val a = Seq.fill(32)((rnd.nextFloat() - 0.5f) * 3f)
    val b = Seq.fill(32)((rnd.nextFloat() - 0.5f) * 3f)
    val d = Quantization.int8(df((1L, a), (2L, b)), "vec")
      .select("id", "q_vec").collect()
      .map(r => (r.getLong(0), r.getSeq[Byte](1).map(_.toLong))).toMap
    val (qa, qb) = (d(1L), d(2L))
    val expect = qa.zip(qb).map { case (x, y) => x * y }.sum.toDouble /
      (math.sqrt(qa.map(x => x * x).sum.toDouble) *
        math.sqrt(qb.map(x => x * x).sum.toDouble))
    val t = Quantization.int8(df((1L, a), (2L, b)), "vec")
      .select(col("id"), col("q_vec"))
    val got = t.as("x").join(t.as("y"), col("x.id") < col("y.id"))
      .select(ArrayOps.cosineInt8(col("x.q_vec"), col("y.q_vec")))
      .head().getDouble(0)
    assert(math.abs(got - expect) < 1e-12 || got == expect,
      s"$got vs $expect")
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
