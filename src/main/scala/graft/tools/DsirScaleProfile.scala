package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** Scale evidence for DSIR importance resampling (q150): fit + score +
  * resample at 10⁵ and 10⁶ synthetic documents, local[16]. The claims
  * under test:
  *
  *  1. fitting is two map-side-combined aggregations whose shuffles
  *     carry ≤ 16^hexChars rows each, so fit wall grows far slower
  *     than 10× per 10× docs (it is the two corpus scans);
  *  2. scoring + Gumbel top-k is ONE pass — a map-side projection
  *     through the dense weight literal into TakeOrderedAndProject,
  *     so only k rows per partition ever reach the driver;
  *  3. selection quality survives scale: the resample keeps pulling
  *     target-distribution docs ahead of off-target ones.
  *
  * The corpus is a 70/30 mix of two disjoint hashed vocabularies
  * ("wiki" ids ending 0–6, "spam" 7–9); the target is a separate small
  * all-wiki sample, so the expected behavior is a wiki-dominated
  * resample at every scale.
  */
object DsirScaleProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // doc i: 20-40 words from vocab A (w0..w4999) when i%10<=6, else
    // from vocab B (x0..x4999) — disjoint token spaces, deterministic
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      array_join(transform(
        sequence(lit(1), (pmod(hash(col("id")), lit(21)) + lit(20))),
        i => concat(
          when(pmod(col("id"), lit(10)) <= 6, lit("w")).otherwise(lit("x")),
          pmod(hash(col("id") * 37 + i), lit(5000)))),
        " ").as("text"))
    // target: 1,000 all-wiki docs drawn from a DIFFERENT id stride so
    // fit generalizes from distribution, not document identity
    val target = spark.range(1000L).select(
      (col("id") + lit(10000000L)).as("doc_id"),
      array_join(transform(
        sequence(lit(1), lit(30)),
        i => concat(lit("w"), pmod(hash(col("id") * 41 + i), lit(5000)))),
        " ").as("text")).persist()
    target.count(): Unit

    for (n <- Seq(100000L, 1000000L)) {
      val docs = corpus(n).persist()
      docs.count(): Unit
      val t0 = System.nanoTime()
      val wts = Dsir.fit(target, docs, "text", hexChars = 3)
      val fitSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val picked = Dsir.resample(docs, "doc_id", "text", wts,
        k = 10000, seed = 2026L).persist()
      val total = picked.count()
      val resampleSec = (System.nanoTime() - t1) / 1e9
      val wiki = picked.filter(pmod(col("doc_id"), lit(10)) <= 6).count()
      println(f"[dsir] n=$n%8d fit=$fitSec%6.1f s  score+topk=" +
        f"$resampleSec%6.1f s  buckets=${wts.byBucket.size}%5d  " +
        f"wikiFrac=${wiki.toDouble / total}%.3f (corpus 0.7)")
      picked.unpersist(blocking = false)
      docs.unpersist(blocking = false)
    }
    spark.stop()
  }
}
