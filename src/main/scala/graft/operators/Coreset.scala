package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy k-center coreset selection (Gonzalez 1985; the "k-center
  * greedy" active-learning / data-selection baseline, cf. Sener &
  * Savarese 2018, arXiv:1708.00489): pick the point farthest from the
  * already-chosen set, k times. The chosen set is a maximally-spread
  * summary of the corpus — the standard seed set for diverse sampling,
  * annotation budgets, and coverage-oriented curation.
  *
  * Determinism contract (the q115 fixed-point discipline): vectors are
  * quantized to an integer grid and all distances are exact integer
  * L2², so the selection — including every tie-break — is bit-identical
  * under any partitioning and replayable step-by-step in SQL. Seed =
  * the smallest id; each subsequent pick is argmax of (distance to the
  * chosen set, ties to the smallest id).
  *
  * Scale shape (100 TB): k driver-coordinated rounds, each ONE map-side
  * scan of the corpus — the chosen centers travel to executors as a
  * k·dim packed-long literal (broadcast-sized by construction: k is a
  * selection budget, not a corpus fraction), the per-row distance is a
  * single primitive-loop kernel call, and the round's argmax is a
  * TakeOrderedAndProject (one row per partition reaches the driver).
  * Nothing is ever collected except the k chosen rows themselves. The
  * corpus scan is cached across rounds; lineage is flat (every round
  * recomputes from the cached quantized scan — no iterative chaining).
  */
object Coreset {

  /** The greedy k-center selection: (rank 1..k, id, dist) where `dist`
    * is the exact integer L2² from the picked point to the
    * previously-chosen set (the classic "coverage radius" sequence —
    * nonincreasing after the seed; the seed itself reports 0).
    */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String,
      k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val spark = df.sparkSession
    // NULL vectors carry no geometry and are excluded up front (a NULL
    // qv would crash the seed collect and poison every kernel call);
    // NULL/uncastable ids are excluded for the same reason — a NULL id
    // sorts first (NULLS FIRST), would become the seed, and crash the
    // seed collect with an opaque NPE, while in later rounds the
    // !isin(...) exclusion drops NULL-id rows silently
    val qdf = df.select(col(idCol).cast("long").as("id"),
        Clustering.quantizeF(col(vecCol), scale).as("qv"))
      .filter(col("id").isNotNull && col("qv").isNotNull)
      .persist()
    try {
      val dim = Centroids.vectorDim(qdf)

      // Seed: the smallest id (one bounded row to the driver).
      val seedRow = qdf.orderBy(col("id")).limit(1).collect()(0)
      val chosen = ArrayBuffer[(Long, Long, Array[Long])](
        (seedRow.getLong(0), 0L,
          seedRow.getSeq[Long](1).toArray))

      var t = 1
      while (t < k) {
        val flat = chosen.iterator.flatMap(_._3).toArray
        val ids = chosen.map(_._1)
        // One scan: distance to the chosen set (min over centers, a
        // single packed-literal kernel call), argmax with id tie-break.
        // Chosen rows are excluded explicitly — on a corpus of exact
        // duplicates every remaining distance is 0 and the tie-break
        // alone must not re-pick a center.
        val next = qdf
          .filter(!col("id").isin(ids.toSeq: _*))
          .select(col("id"), col("qv"),
            Centroids.nearestOfLit(col("qv"), flat, dim)
              .getItem(1).as("dist"))
          .orderBy(col("dist").desc, col("id").asc)
          .limit(1).collect()
        if (next.isEmpty) {
          t = k // fewer distinct rows than k: return what exists
        } else {
          val r = next(0)
          chosen += ((r.getLong(0), r.getLong(2),
            r.getSeq[Long](1).toArray))
          t += 1
        }
      }

      val rows = chosen.iterator.zipWithIndex.map { case ((id, d, _), i) =>
        Row((i + 1).toLong, id, d)
      }.toSeq
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("rank", LongType, nullable = false),
          StructField(idCol, LongType, nullable = false),
          StructField("dist", LongType, nullable = false))))
    } finally qdf.unpersist()
  }
}
