package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayOps

/** Product-quantization invariants: hand-computed encode/LUT/ADC on a
  * tiny explicit codebook, exact-recovery of the brute-force top-k on
  * clustered data once the refine shortlist covers the cluster,
  * seeded-training determinism, and the zero-vector guard.
  */
class PqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def df(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("id", "vec")
  }

  test("encode/LUT/ADC agree with hand computation on an explicit codebook") {
    // m=2 subspaces × ksub=2 centroids × subDim=2, unit-ish vectors.
    // Subspace 0: c0=(1,0), c1=(0,1); subspace 1: c0=(-1,0), c1=(0.6,0.8)
    val cb = Array(1f, 0f, 0f, 1f, -1f, 0f, 0.6f, 0.8f)
    val cbLit = ArrayOps.packedFloatLit(cb)
    // vector (2,0, 0,2): normalized (1/√2)(1,0,0,1).
    //   sub0 (0.707,0): nearest c0 (d²≈0.086) vs c1 (d²≈1.5) → code 0
    //   sub1 (0,0.707): c0 d²=1.5, c1 d²=0.369 → code 1
    val d = df((1L, Seq(2f, 0f, 0f, 2f)))
    val codes = d.select(
      ArrayOps.pqEncodeF(col("vec"), cbLit, 2, 2, 2).as("codes"))
      .head().getSeq[Byte](0)
    assert(codes == Seq[Byte](0, 1), codes.toString)
    // LUT of the same vector: dots of the normalized subvectors with
    // each centroid: [0.707, 0, -0, 0.566]; ADC(codes) = lut[0] + lut[2+1]
    val lut = d.select(
      ArrayOps.pqLutF(col("vec"), cbLit, 2, 2, 2).as("lut"))
      .head().getSeq[Double](0)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(lut(0) - s) < 1e-6 && math.abs(lut(1)) < 1e-6 &&
      math.abs(lut(2)) < 1e-6 && math.abs(lut(3) - 0.8 * s) < 1e-6,
      lut.toString)
    val adc = d.select(ArrayOps.pqAdcF(
      ArrayOps.pqLutF(col("vec"), cbLit, 2, 2, 2),
      ArrayOps.pqEncodeF(col("vec"), cbLit, 2, 2, 2), 2)).head().getDouble(0)
    assert(math.abs(adc - (lut(0) + lut(3))) < 1e-12)
  }

  test("refine shortlist covering the cluster recovers the exact top-k") {
    // three tight clusters of 8; refine·k = 20 ≥ cluster size, so every
    // true neighbor (always in-cluster — clusters are near-orthogonal)
    // survives the ADC shortlist and the exact re-rank must reproduce
    // the brute-force top-5 EXACTLY, not just at high recall
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
    val pq = Similarity.pqTopK(corpus, queries, "id", "vec",
      dim = 16, k = 5, m = 4, ksub = 8, refine = 4, sampleN = 24)
      .select("q_id", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, "id", "vec", k = 5)
      .select("q_id", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pq == exact, s"pq=$pq\nexact=$exact")
  }

  test("seeded training is deterministic across runs") {
    val rnd = new scala.util.Random(29)
    val corpus = df((1L to 60L).map(i =>
      (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 2f))): _*)
    val queries = corpus.filter(col("id") <= 3L)
    def run() = Similarity.pqTopK(corpus, queries, "id", "vec",
      dim = 16, k = 5, m = 4, ksub = 8, refine = 2, sampleN = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(identity).toSeq
    assert(run() == run())
  }

  test("zero vectors neither crash nor emit NaN ranks") {
    val rnd = new scala.util.Random(31)
    val corpus = df(((1L to 20L).map(i =>
      (i, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 2f))) :+
      (99L, Seq.fill(16)(0f))): _*)
    val queries = corpus.filter(col("id").isin(1L, 99L))
    val out = Similarity.pqTopK(corpus, queries, "id", "vec",
      dim = 16, k = 3, m = 4, ksub = 4, refine = 2, sampleN = 21)
      .collect()
    assert(out.length == 6)  // both queries answered with full top-3
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 3))
  }

  test("lake-refined PQ equals the in-memory path; refine scan is id-pruned") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files
      .createTempDirectory("pq_ann_lake_").toString
    graft.sinks.Lake.writeAnnLake(emb, dir, "vec_id", nFiles = 4)

    // the lake is range-partitioned and sorted: files cover disjoint,
    // ordered id intervals (the property row-group pruning leans on)
    val mins = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("vec_id"))
      .groupBy("f").agg(min("vec_id").as("lo"), max("vec_id").as("hi"))
      .orderBy("lo").collect()
    assert(mins.length == 4)
    assert(mins.sliding(2).forall(p =>
      p.head.getLong(2) < p.last.getLong(1))) // hi(i) < lo(i+1)

    // the operator must work at DEFAULT session config (it raises the
    // parquet in-filter threshold per-read itself) and restore the
    // session conf afterwards — a leaked threshold would silently
    // change every later parquet read in the session
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val before = spark.conf.get(key) // the built-in default ("10")
    val lake = Similarity.pqTopKOverLake(spark, dir, qs, "vec_id",
      "embedding", dim = 64, k = 5, m = 16, ksub = 16, refine = 4)
    val lakeRows = lake.collect() // refine scan ran inside the operator
    assert(spark.conf.get(key) === before,
      s"operator leaked $key=${spark.conf.get(key)}")
    val mem = Similarity.pqTopK(emb, qs, "vec_id", "embedding",
      dim = 64, k = 5, m = 16, ksub = 16, refine = 4)
    assert(lakeRows.map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2))).toSet ===
      mem.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2))).toSet)

    // the refine re-read's shape: a shortlist-sized IN filter reaches
    // the parquet scan when the threshold covers it (the raise the
    // operator now performs around its materialization)
    spark.conf.set(key, "1000")
    try {
      val shaped = spark.read.parquet(dir)
        .filter(col("vec_id").isin((0L until 200L).map(
          _.asInstanceOf[Any]): _*))
        .select(col("vec_id"), col("embedding"))
      val plan = shaped.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [In(vec_id"), plan.linesIterator
        .filter(_.contains("PushedFilters")).mkString("\n"))
    } finally spark.conf.unset(key)
  }
}
