package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-18 step profiler for the IVF lake WRITE path (the fixture cost
  * of q137/q152/q162/q164/q171/q184): times each stage of
  * writeIvfLake's recipe in isolation under the Bench session conf, so
  * the ~0.8 s of per-write driver time CommitProfile measures can be
  * attributed (train vs plan/codegen vs sidecar writes vs baseline).
  */
object IvfWriteProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfwrite] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    t("warmup count")(emb.count())
    val dim = 64
    val cells = 64

    for (round <- 1 to 3) {
      println(s"-- round $round --")
      val sample = t("sample collect (2048)") {
        emb.select(col("vec_id").as("id"), col("embedding").as("v"))
          .orderBy(col("id")).limit(2048)
          .collect().map(_.getSeq[Float](1).toArray)
      }
      val centroids = t("kmeans train (64c x 10it)") {
        graft.operators.Similarity.trainSphericalKMeans(
          sample, cells, dim, 10, 42L)
      }
      val centLit = t("packedFloatLit") {
        graft.functions.ArrayOps.packedFloatLit(centroids)
      }
      val dir = Tables.freshScratchDir("graft_ivfwriteprof_", sfDir)
        .toString + s"/lake$round"
      val data = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<float>").as("vec"))
      t("partitioned write (assign+shuffle)") {
        data.withColumn("cell",
          graft.functions.ArrayOps.nearestCentroidF(col("vec"), centLit, dim))
          .repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(dir)
      }
      t("centroid sidecar write") {
        centroids.grouped(dim).zipWithIndex
          .map { case (c, i) => (i.toLong, c.toSeq) }.toSeq
          .toDF("cell_id", "centroid").coalesce(1)
          .write.mode("overwrite").parquet(dir + "/_ivf_centroids")
      }
      val held = t("baseline sample collect") {
        data.orderBy(hash(col("id")), col("id")).limit(2048)
          .collect().map(_.getSeq[Float](1).toArray)
      }
      val resid = t("meanResidual") {
        graft.operators.Similarity.meanResidual(held, centroids, dim)
      }
      t("stats sidecar write") {
        Seq((resid, held.length.toLong))
          .toDF("train_residual", "n_sample").coalesce(1)
          .write.mode("overwrite").parquet(dir + "/_ivf_stats")
      }
    }
    spark.stop()
  }
}
