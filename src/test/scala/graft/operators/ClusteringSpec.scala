package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The claim q115's oracle can't state: fixed-point k-means is
  * bit-identical under ANY partitioning. Float k-means is not — shuffle
  * arrival order changes centroid sums in the last ulps, which flips
  * assignments, which changes what a semantic dedup deletes from a
  * training corpus. Exact integer sums are order-independent, so the
  * same input in 1, 3, or 17 partitions must produce the same clusters.
  */
class ClusteringSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def result(parts: Int): Set[(Long, Long, Long)] = {
    val emb = graft.Tables.embeddings(spark, sf).repartition(parts)
    Clustering.fixedPointKMeans(emb, "vec_id", "embedding", k = 4, iters = 3)
      .select("id", "cluster", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("assignments are bit-identical across adversarial partitionings") {
    val a = result(1)
    val b = result(3)
    val c = result(17)
    assert(a == b && b == c, "fixed-point k-means must not depend on partitioning")
    assert(a.nonEmpty && a.map(_._2).size > 1, "expected multiple clusters")
  }

  test("semanticDedup drops planted near-clones and keeps originals") {
    val base = graft.Tables.embeddings(spark, sf).select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("embedding"))
    val clones = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000).as("vec_id"),
        transform(col("embedding"), x => x + lit(5.0e-7)).as("embedding"))
    val assigned = Clustering.fixedPointKMeans(base.unionByName(clones),
      "vec_id", "embedding", k = 4, iters = 2)
    val out = Clustering.semanticDedup(assigned, threshold = 256L)
      .select("id", "kept").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val (cloneIds, naturalIds) = out.keySet.partition(_ >= 5000)
    assert(cloneIds.size == 10)
    assert(cloneIds.forall(id => !out(id)), "every planted clone must be dropped")
    assert(naturalIds.forall(out), "every natural row must survive")
  }

  test("a cluster that loses all members retires its label") {
    import spark.implicits._
    // Seeds 0 and 1 are byte-identical, so centroids 0 and 1 coincide;
    // the (dist, cluster) tie-break sends every tied row to cluster 0,
    // cluster 1 has no members after round 1's update and its label must
    // be retired — not NPE'd on, not resurrected.
    val rows = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(0.0f, 0.0f)),
      (2L, Array(5.0f, 5.0f)), (3L, Array(5.1f, 5.0f)))
      .toDF("vec_id", "embedding")
    val out = Clustering.fixedPointKMeans(rows, "vec_id", "embedding",
      k = 3, iters = 3)
      .select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L),
      s"expected label 1 retired and ties broken to cluster 0, got $out")
  }
}
