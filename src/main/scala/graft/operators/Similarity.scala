package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ArrayOps, Vectors}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two members:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The (small) query set is broadcast against the corpus, so the corpus
  *    is scanned once with no shuffle of the embedding column; ranking
  *    shuffles only (q_id, id, sim) triples.
  *  - [[lshTopK]]: the scale path — random-hyperplane bucketing on both
  *    sides; candidates are scored only within a bucket. At 1000×
  *    the corpus this turns O(|Q|·|C|) scoring into O(|Q|·|C|/2^planes·ε)
  *    with a recall knob (`nPlanes`); buckets are deterministic so the
  *    result is stable run to run.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each row of `queries` (excluding
    * self-matches on id). Output: (q_id, id, rank).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        ArrayOps.cosineF(col("q_vec"), col("vec")).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id"), col("rank").cast("long").as("rank"))
  }

  /** LSH-bucketed ANN with multi-probe: the corpus is bucketed once by
    * hyperplane signs; each QUERY probes its own bucket plus every bucket
    * at Hamming distance 1 (flip one sign bit). Only the tiny query side
    * fans out (×(nPlanes+1)), the corpus is still scanned exactly once and
    * shuffled only by bucket id — the property that matters at 100 TB.
    * Recall/cost knob: more planes → smaller buckets, lower recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int = 5, nPlanes: Int = 4): DataFrame = {
    val bucket = ArrayOps.hyperplaneBucketF(col("vec"), nPlanes)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("bucket0",
        ArrayOps.hyperplaneBucketF(col("q_vec"), nPlanes))
      .withColumn("bucket", explode(array(
        (col("bucket0") +: (0 until nPlanes).map(p =>
          col("bucket0").bitwiseXOR(lit(1L << p)))): _*)))
      .drop("bucket0")
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", bucket)
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id"),
        ArrayOps.cosineF(col("q_vec"), col("vec")).as("sim"))
      .groupBy(col("q_id"), col("id")).agg(max(col("sim")).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id"), col("rank").cast("long").as("rank"))
  }
}
