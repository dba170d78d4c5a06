package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Scratch profiler for q50_ann_ivf: times each stage in isolation to pin
  * where the BENCH_r02 22.3 s actually goes. Not part of the shipped
  * surface.
  */
object IvfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    time("warmup count")(emb.count())

    // stage 1: training sample collect
    val sample = time("sample collect") {
      emb.select(col("vec_id").as("id"), col("embedding").as("v"))
        .orderBy(col("id")).limit(2048)
        .collect().map(_.getSeq[Float](1).toArray)
    }
    // stage 2: driver k-means
    val centroids = time("kmeans train") {
      Similarity.trainSphericalKMeans(sample, 32, 64, 10, 42L)
    }
    // stage 3: corpus cell assignment only (same packed literal as the
    // shipped operator, so stage times reconcile with full ivfTopK)
    val centLit = graft.functions.ArrayOps.packedFloatLit(centroids)
    time("cell assign count") {
      emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        .withColumn("cell",
          graft.functions.ArrayOps.nearestCentroidF(col("vec"), centLit, 64))
        .agg(sum(col("cell"))).collect()
    }
    // stage 4: query-side top-centroid fan-out only
    time("query probe count") {
      emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .withColumn("cell", explode(
          graft.functions.ArrayOps.topCentroidsF(col("q_vec"), centLit, 64, 8)))
        .count()
    }
    // stage 5: the full operator
    time("full ivfTopK (1st)") {
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 5, nCells = 32, nProbe = 8).count()
    }
    time("full ivfTopK (2nd)") {
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 5, nCells = 32, nProbe = 8).count()
    }
    // comparison: LSH sibling
    time("lshTopK") {
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", dim = 64, k = 5, nPlanes = 4).count()
    }
    spark.stop()
  }
}
