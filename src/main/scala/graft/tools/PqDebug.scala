package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Throwaway recall sweep for PQ parameter selection (not part of the
  * driver surface).
  */
object PqDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = Tables.embeddings(spark, d)
    val qs = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", k = 5)
    val nEx = exact.count()
    for (m <- Seq(8, 16); ksub <- Seq(16, 32); refine <- Seq(1, 4, 8)) {
      val pq = Similarity.pqTopK(emb, qs, "vec_id", "embedding",
        dim = 64, k = 5, m = m, ksub = ksub, refine = refine)
      val hit = pq.join(exact, Seq("q_id", "id"), "left_semi").count()
      println(s"PQDBG m=$m ksub=$ksub refine=$refine recall=${hit.toDouble / nEx}")
    }
    spark.stop()
  }
}
