package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Graph}

/** Scale evidence for the round's exact-integer operators: fixed-point
  * k-means at 10⁶ × 64-dim and integer PageRank at millions of edges.
  *
  * Beyond wall time, each op is run TWICE under different partition
  * counts and compared by an order-free checksum — the determinism
  * claim ClusteringSpec/GraphSpec prove at sf0.001 demonstrated at
  * memory-pressure scale (this is the property float versions lose
  * first when partial aggregation reorders).
  *
  * Corpus geometry is CLUSTERED (256 seeded centers + noise), matching
  * AnnScaleProfile's rationale: real embedding corpora cluster, and a
  * k-means profile on uniform noise would measure a degenerate layout.
  *
  * Usage: ClusterScaleProfile [nVectors] [k] [iters] [nEdges]
  */
object ClusterScaleProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val nEdges = args.lift(3).map(_.toLong).getOrElse(4000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[clusterprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // 256 seeded centers, ±0.05 noise per coordinate — deterministic,
    // no Math.random, same recipe family as AnnScaleProfile.
    val dim = 64
    def corpus = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val center = pmod(xxhash64(pmod(col("id"), lit(256L)), i, lit(1L)),
          lit(2000000L)).cast("double") / 1000000.0 - 1.0
        val noise = pmod(xxhash64(col("id"), i, lit(2L)),
          lit(100000L)).cast("double") / 1000000.0 - 0.05
        (center + noise).cast("float")
      }).as("embedding"))

    def kmeansChecksum(parts: Int): Long = {
      val assigned = Clustering.fixedPointKMeans(
        corpus.repartition(parts), "vec_id", "embedding", k, iters)
      assigned.agg(bit_xor(xxhash64(col("id"), col("cluster"), col("dist"))))
        .collect()(0).getLong(0)
    }
    val ck1 = time(s"kmeans n=$n k=$k iters=$iters (p=$cpus)") {
      kmeansChecksum(cpus.toInt)
    }
    val ck2 = time(s"kmeans n=$n k=$k iters=$iters (p=7)") {
      kmeansChecksum(7)
    }
    println(s"[clusterprof] kmeans checksums equal: ${ck1 == ck2} ($ck1)")

    // Synthetic digraph: nEdges hashed (src, dst) pairs over n/4 nodes —
    // collisions create parallel edges (collapsed by the op) and a
    // natural in-degree skew.
    val nNodes = math.max(n / 4, 1000L)
    def edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(3L)), lit(nNodes)).as("src"),
      pmod(xxhash64(col("id"), lit(4L)), lit(nNodes)).as("dst"))

    def prChecksum(parts: Int): Long = {
      val ranks = Graph.pageRank(edges.repartition(parts), iters = 3)
      val ck = ranks.agg(bit_xor(xxhash64(col("node"), col("pr"))))
        .collect()(0).getLong(0)
      ranks.unpersist(blocking = false)
      ck
    }
    val pk1 = time(s"pagerank edges=$nEdges nodes=$nNodes (p=$cpus)") {
      prChecksum(cpus.toInt)
    }
    val pk2 = time(s"pagerank edges=$nEdges nodes=$nNodes (p=11)") {
      prChecksum(11)
    }
    println(s"[clusterprof] pagerank checksums equal: ${pk1 == pk2} ($pk1)")
    spark.stop()
  }
}
