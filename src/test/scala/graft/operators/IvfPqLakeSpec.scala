package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF+PQ composed lake ([[Similarity.writeIvfPqLake]] /
  * [[Similarity.ivfPqTopKOverLake]]): cell pruning AND cheap-code
  * scoring in one layout. Pinned: exact equality with the frozen
  * in-memory twin, the shortlist scan reading ONLY (id, code) — the
  * float column pruned out — cell partition pruning, sidecar
  * round-trip, and a recall floor vs brute force on a clustered corpus.
  */
class IvfPqLakeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 16

  private def corpus(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    (0 until n).map { i =>
      val c = i % 8
      (i.toLong, Array.tabulate(dim)(j =>
        (math.cos(c * 0.9 + j * 0.3) + rnd.nextGaussian() * 0.1).toFloat)
        .toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def topk(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("lake search equals the frozen in-memory twin exactly; recall floor holds") {
    val emb = corpus(240)
    val qs = emb.filter(col("vec_id") < 6)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_").toString +
      "/lake"
    val cells = Similarity.writeIvfPqLake(emb, dir, "vec_id", "embedding",
      dim, nCells = 8, m = 4, ksub = 16)
    assert(cells === 8)
    val lake = topk(Similarity.ivfPqTopKOverLake(spark, dir, qs,
      "vec_id", "embedding", dim, k = 5, nProbe = 4, refine = 4))
    val mem = topk(Similarity.ivfPqTopKFrozen(emb, qs, "vec_id",
      "embedding", dim, k = 5, lakeDir = dir, nProbe = 4, refine = 4))
    assert(lake === mem, "lake and frozen twin diverged")
    assert(lake.map(_._1).distinct.size === 6)
    // recall vs brute force: clustered corpus, 4/8 cells probed, exact
    // re-rank — at least half the true top-5 must survive
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding",
      k = 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = lake.count(t => exact.contains((t._1, t._2)))
    assert(hits >= exact.size / 2, s"recall too low: $hits/${exact.size}")
  }

  test("shortlist scan reads only (id, code): float column pruned; cells partition-pruned") {
    val emb = corpus(240)
    val qs = emb.filter(col("vec_id") === 0)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq2_").toString +
      "/lake"
    Similarity.writeIvfPqLake(emb, dir, "vec_id", "embedding", dim,
      nCells = 8, m = 4, ksub = 16)
    val res = Similarity.ivfPqTopKOverLake(spark, dir, qs, "vec_id",
      "embedding", dim, k = 3, nProbe = 2, refine = 1) // refine=1: the
    // result plan IS the shortlist plan — no second scan to conflate
    val p = res.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty, p)
    assert(readSchemas.forall(!_.contains("vec")),
      s"shortlist scan reads the float column:\n$readSchemas")
    assert(p.contains("PartitionFilters: [cell"),
      s"probe filter did not become a partition filter:\n$p")
  }

  test("compaction preserves the code column and search results on an IVF+PQ lake") {
    val emb = corpus(240)
    val qs = emb.filter(col("vec_id") < 4)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_cmp_")
      .toString + "/lake"
    Similarity.writeIvfPqLake(emb.filter(col("vec_id") % 3 =!= 0), dir,
      "vec_id", "embedding", dim, nCells = 8, m = 4, ksub = 16)
    // appends create multi-file cells (appendToIvfLake only needs the
    // centroid sidecar, which the IVFPQ writer also lays down — but it
    // writes NO code column, so rebuild codes by re-writing: instead,
    // append pre-encoded batches through the same writer shape)
    val flatCb = spark.read.parquet(dir + "/_pq_codebooks")
      .collect()(0).getSeq[Float](2).toArray
    val cents = spark.read.parquet(dir + "/_ivf_centroids").collect()
      .sortBy(_.getLong(0)).flatMap(_.getSeq[Float](1)).toArray
    import graft.functions.ArrayOps
    emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<float>").as("vec"))
      .withColumn("code", ArrayOps.pqEncodeF(col("vec"),
        ArrayOps.packedFloatLit(flatCb), 4, 16, dim / 4))
      .withColumn("cell", ArrayOps.nearestCentroidF(col("vec"),
        ArrayOps.packedFloatLit(cents), dim))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(dir)
    val pre = topk(Similarity.ivfPqTopKOverLake(spark, dir, qs,
      "vec_id", "embedding", dim, k = 4, nProbe = 4, refine = 4))
    val (nb, na) = Similarity.compactIvfLake(spark, dir)
    assert(na < nb, s"nothing compacted: $nb -> $na")
    // code column survived the rewrite for every row
    val nullCodes = spark.read.parquet(dir)
      .filter(col("code").isNull).count()
    assert(nullCodes === 0L, "compaction dropped PQ codes")
    val post = topk(Similarity.ivfPqTopKOverLake(spark, dir, qs,
      "vec_id", "embedding", dim, k = 4, nProbe = 4, refine = 4))
    assert(post === pre, "compaction changed IVFPQ search results")
  }

  test("sidecars round-trip; dim mismatch fails fast") {
    val emb = corpus(120)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq3_").toString +
      "/lake"
    Similarity.writeIvfPqLake(emb, dir, "vec_id", "embedding", dim,
      nCells = 4, m = 4, ksub = 8)
    val cb = spark.read.parquet(dir + "/_pq_codebooks").collect()
    assert(cb.length === 1 && cb(0).getInt(0) === 4 && cb(0).getInt(1) === 8)
    assert(cb(0).getSeq[Float](2).length === 8 * dim)
    val qs = emb.filter(col("vec_id") < 2)
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKOverLake(spark, dir, qs, "vec_id", "embedding",
        dim = 32, k = 3)
    }
    assert(e.getMessage.contains("dim") || e.getMessage.contains("32"),
      e.getMessage)
  }
}
