package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Scale evidence for BM25 retrieval (q121): `bm25TopK` at 10⁵ and
  * 10⁶ synthetic documents, local[16]. The claims under test:
  *
  *  1. only postings of QUERIED terms ever leave the corpus scan (the
  *     broadcast query-term prune), so wall tracks the corpus SCAN
  *     plus queried-term posting volume — not vocabulary size, not an
  *     all-terms inverted index build;
  *  2. the per-query top-k heap keeps the shuffle at ≤ k rows per
  *     query per mapper — wall grows far slower than 10× per 10× docs;
  *  3. results are deterministic integer-micro scores (re-run equal).
  *
  * Docs are 20–40 words from a 10k-word Zipf-ish vocabulary; the 10
  * queries mix head and tail terms so both dense and sparse postings
  * are exercised.
  */
object Bm25ScaleProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        1 << 20)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Zipf-ish: token id = hash % (1 + hash2 % 10000) biases toward
    // small ids, giving realistic head/tail posting skew
    def corpus(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      array_join(transform(
        sequence(lit(1), (pmod(hash(col("id")), lit(21)) + lit(20))),
        i => concat(lit("t"),
          pmod(pmod(hash(col("id") * 31 + i), lit(10000)),
            pmod(hash(col("id") * 17 + i), lit(9999)) + lit(1)))),
        " ").as("text"))

    val queries = Seq[(Long, Seq[String])](
      (1L, Seq("t0", "t1")), (2L, Seq("t2", "t3", "t5")),
      (3L, Seq("t10", "t100")), (4L, Seq("t1000", "t7")),
      (5L, Seq("t4242", "t17")), (6L, Seq("t9000", "t1")),
      (7L, Seq("t123", "t456")), (8L, Seq("t88", "t2")),
      (9L, Seq("t3141", "t0", "t99")), (10L, Seq("t5555", "t6666")))

    for (n <- Seq(100000L, 1000000L)) {
      val docs = corpus(n).persist()
      docs.count(): Unit
      def run(): Array[(Long, Long, Long, Long)] =
        Retrieval.bm25TopK(docs, "doc_id", "text", queries, k = 10)
          .collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val t0 = System.nanoTime()
      val a = run()
      val sec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val b = run()
      val warm = (System.nanoTime() - t1) / 1e9
      assert(a.toSeq == b.toSeq, "BM25 must be deterministic")
      println(f"[bm25] n=$n%8d cold=$sec%6.1f s warm=$warm%6.1f s  " +
        f"results=${a.length}%3d  deterministic=true")
      docs.unpersist(blocking = false)
    }
    spark.stop()
  }
}
