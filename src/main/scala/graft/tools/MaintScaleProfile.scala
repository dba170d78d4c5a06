package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Scale evidence for the round-13 maintenance/streaming surface — the
  * two scaladoc claims that deserve measurement rather than assertion:
  *
  *  1. [[Similarity.compactIvfLake]] costs append CHURN, not the lake:
  *     an append clustered into a few cells (one topic's batch) leaves
  *     most cells single-file, and compaction rewrites only the fat
  *     ones — measured against a spread append that fattens every
  *     cell, same corpus, same lake size.
  *  2. [[graft.streaming.NearDupStream]]'s per-batch match is a SCAN
  *     of the persisted state (never a shuffle of it): wall grows
  *     about linearly in corpus size while the candidate and verify
  *     work stays delta-sized — and the streamed result equals the
  *     one-shot batch operator at every scale.
  *
  * Run: `sbt "runMain graft.tools.MaintScaleProfile"` (SPARK_GRAFT_CPUS
  * to size the session; scales 10⁵ and 10⁶ like the sibling profiles).
  */
object MaintScaleProfile {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    compaction(spark)
    nearDupStream(spark)
    heavyDupGate(spark)
    spark.stop()
  }

  /** The round-13 size-gate fix under adversarial load: a corpus where
    * HALF the docs have verbatim twins (candidates = n/2, the regime
    * the old mandatory broadcast died in). Both winnowedRunPairs
    * strategies must return the same pair count; the shuffle fallback's
    * wall backs the "degrades to linear shuffles" claim.
    */
  private def heavyDupGate(spark: SparkSession): Unit = {
    for (n <- Seq(20000L, 100000L)) {
      val half = n / 2
      def text(idc: org.apache.spark.sql.Column) = concat_ws(" ",
        (0 until 12).map(t =>
          concat(lit("w"), pmod(hash(idc, lit(t)), lit(1000000)))): _*)
      val docs = spark.range(half)
        .select(col("id").as("doc_id"), text(col("id")).as("text"))
        .unionByName(spark.range(half).select(
          (col("id") + half).as("doc_id"), text(col("id")).as("text")))
      def run(limit: Long, label: String): Long = {
        val t0 = System.nanoTime()
        val c = graft.operators.Dedup.winnowedRunPairs(docs, "doc_id",
          "text", broadcastCandLimit = limit).count()
        println(f"[heavydup] n=$n%7d  $label%-9s  pairs=$c%7d  " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%6.1f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        c
      }
      val b = run(Long.MaxValue, "broadcast")
      val s = run(1L, "shuffle")
      println(s"[heavydup] n=$n  match=${b == s}")
    }
  }

  /** 8-cluster synthetic embeddings; `clusterOf` pins a row's cluster so
    * an append can be drawn from one topic (few cells) or all topics.
    */
  private def vectors(spark: SparkSession, n: Long, dim: Int,
      clusters: Int, onlyCluster: Int = -1) = {
    val base = spark.range(n)
    val src = if (onlyCluster >= 0)
      base.withColumn("c", lit(onlyCluster))
    else base.withColumn("c", pmod(col("id"), lit(clusters)))
    src.select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), j =>
        cos(col("c") * 0.9 + j * 0.3) +
          (pmod(hash(col("vec_id"), j), lit(1000)).cast("double") -
            500.0) / 5000.0).cast("array<float>").as("embedding"))
  }

  private def dataFileCount(dir: String): Long =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.listFiles().count(f => f.isFile &&
        !f.getName.startsWith("_") && !f.getName.startsWith(".")).toLong)
      .sum

  private def compaction(spark: SparkSession): Unit = {
    val dim = 32
    for (n <- Seq(100000L, 1000000L)) {
      for ((label, only) <- Seq("spread-append" -> -1, "one-topic" -> 3)) {
        val dir = graft.Tables
          .freshScratchDir("graft_ivflake_prof_", s"$n$label").toString
        val corpus = vectors(spark, n, dim, 8)
        Similarity.writeIvfLake(corpus, dir, "vec_id", "embedding",
          dim, nCells = 64): Unit
        // 3 appends of 2% each — churn shape is what varies
        (0 until 3).foreach { i =>
          Similarity.appendToIvfLake(
            vectors(spark, n / 50, dim, 8, onlyCluster = only)
              .select((col("vec_id") + n + i * n).as("vec_id"),
                col("embedding")),
            dir, "vec_id", "embedding", dim)
        }
        val fatCells = Option(new java.io.File(dir).listFiles())
          .getOrElse(Array.empty)
          .filter(f => f.isDirectory && f.getName.startsWith("cell="))
          .count(d => d.listFiles().count(f => f.isFile &&
            !f.getName.startsWith("_") && !f.getName.startsWith(".")) > 1)
        val t0 = System.nanoTime()
        val (nb, na) = Similarity.compactIvfLake(spark, dir)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[compact] n=$n%8d  $label%-13s  files $nb%4d -> $na%3d" +
          f"  fatCells=$fatCells%3d  wall=$sec%6.2f s")
        graft.Tables.deleteRecursively(java.nio.file.Paths.get(dir))
      }
    }
  }

  private def nearDupStream(spark: SparkSession): Unit = {
    for (n <- Seq(100000L, 1000000L)) {
      // ~14-token docs; every 200th delta doc is a near-copy of a
      // corpus doc (same 13 leading tokens, one swapped)
      def text(idc: org.apache.spark.sql.Column) = concat_ws(" ",
        (0 until 14).map(t =>
          concat(lit("w"), pmod(hash(idc, lit(t)), lit(50000)))): _*)
      val corpus = spark.range(n)
        .select(col("id").as("doc_id"), text(col("id")).as("text"))
      val delta = spark.range(500).select(
        (col("id") + n).as("doc_id"),
        when(col("id") % 200 === 0,
          concat(substring_index(text(col("id")), " ", 13),
            lit(" swapped")))
          .otherwise(text(col("id") + 7000000L)).as("text"))
      val scratch = graft.Tables
        .freshScratchDir("graft_neardup_prof_", n.toString).toString
      var t0 = System.nanoTime()
      graft.streaming.NearDupStream.writeCorpusState(
        corpus, "doc_id", "text", s"$scratch/state")
      val statSec = (System.nanoTime() - t0) / 1e9
      delta.repartition(4).write.parquet(s"$scratch/delta")
      val stream = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$scratch/delta")
      t0 = System.nanoTime()
      val streamed = graft.streaming.NearDupStream.nearDupPairs(spark,
        stream, "doc_id", "text", s"$scratch/state", s"$scratch/pairs",
        checkpointDir = s"$scratch/ckpt", threshold = 0.5)
      val nStream = streamed.count()
      val streamSec = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val nBatch = Dedup.incrementalNearDups(corpus, delta, "doc_id",
        "text", threshold = 0.5).count()
      val batchSec = (System.nanoTime() - t0) / 1e9
      println(f"[neardup] n=$n%8d  state=$statSec%6.1f s  " +
        f"stream(4 batches)=$streamSec%6.1f s  batch=$batchSec%6.1f s  " +
        f"pairs stream/batch=$nStream/$nBatch  match=${nStream == nBatch}")
      graft.Tables.deleteRecursively(java.nio.file.Paths.get(scratch))
    }
  }
}
