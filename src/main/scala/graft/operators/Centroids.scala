package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ArrayOps, TopK}

/** Per-group embedding centroids and centroid-distance outlier mining —
  * the label-noise / contamination audit every embedding-curated corpus
  * runs: compute each group's mean vector, score every member by its
  * distance to its own group's centroid, and surface the k farthest
  * members per group (mislabeled rows, adversarial injections, and
  * off-topic strays all show up here first).
  *
  * Determinism contract (the q115 fixed-point discipline): vectors are
  * quantized to integer grids (`round(v·scale)` per coordinate), the
  * centroid is the element-wise integer mean with TRUNCATING division
  * (exact under any partitioning — integer sums commute), and member
  * distance is exact integer L2² — so the result is bit-identical under
  * any cluster layout and replayable in SQL.
  *
  * Scale shape (100 TB):
  *  - the centroid aggregation is ONE map-side-combined `groupBy(group)`
  *    producing dim+1 longs per group — shuffle is O(groups · dim ·
  *    partitions), never O(rows);
  *  - centroids travel back as a BROADCAST join (groups × dim longs —
  *    label/source cardinality, broadcast-sized by nature), so member
  *    scoring is map-side over the corpus scan;
  *  - the per-group top-k runs through the bounded-heap aggregate
  *    ([[graft.functions.TopK]]): at most k pairs per group per mapper
  *    reach the shuffle, where a window rank would sort every group's
  *    full membership.
  *
  * Reference scope: the reference engine has no vector operations; this
  * is part of the training-data extension surface (group-centroid
  * auditing is the first screen in embedding-based curation pipelines,
  * cf. SemDeDup's cluster-centroid geometry, arXiv:2303.09540).
  */
object Centroids {

  /** Per-group quantized integer centroid: one row per group with the
    * element-wise truncating integer mean of the quantized vectors.
    * Output: (groupCol, n, centroid: array<long>). Rows with a NULL
    * vector are excluded from BOTH `n` and the sums — counting them
    * only in the denominator would silently shrink every coordinate.
    *
    * NULL-group policy: NULL is a GROUP here — unattributed rows get a
    * centroid row like any other group value (the report is "what does
    * each provenance bucket look like", and unlabeled data is a bucket
    * worth seeing). This deliberately differs from [[centroidOutliers]],
    * which EXCLUDES the NULL group: an outlier audit ranks members
    * against their own population, and "unlabeled" is a catch-all, not
    * a population whose geometry means anything.
    *
    * `dim` is read from one bounded `limit(1)` probe (a single row to
    * the driver — same contract as the k-means init collect).
    */
  def groupCentroids(df: DataFrame, vecCol: String, groupCol: String,
      scale: Long = 1000000L): DataFrame =
    groupCentroidsQ(df.select(col(groupCol).as("grp"),
        Clustering.quantizeF(col(vecCol), scale).as("qv"))
      .filter(col("qv").isNotNull))
      .withColumnRenamed("grp", groupCol)

  /** [[groupCentroids]] over an already-quantized, NULL-free
    * (grp, qv) frame — shared with [[centroidOutliers]] so the member
    * scan and the centroid scan agree on one quantization/filter
    * definition and cannot drift.
    */
  private def groupCentroidsQ(qdf: DataFrame): DataFrame = {
    val dim = vectorDim(qdf)
    val sums = qdf.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        (0 until dim).map(i =>
          sum(element_at(col("qv"), i + 1)).as(s"s$i")): _*)
    // `div`, not `/`: Spark's `/` on longs is DOUBLE true-division, and
    // trunc(double(s)/double(n)) can land on the wrong side of an
    // integer boundary once |s| needs more than 53 bits of precision —
    // `s div n` is exact 64-bit truncating division, the oracle's `//`.
    sums.select(col("grp"), col("n"),
      array((0 until dim).map(i =>
        expr(s"s$i div n").cast("long")): _*).as("centroid"))
  }

  /** The k members of each group FARTHEST from their own group's
    * centroid, ranked by (distance DESC, id ASC). Output:
    * (groupCol, rank, idCol, dist) with exact integer L2² distances.
    *
    * Rows whose group is NULL have no centroid and are excluded (a
    * NULL group is not a population to audit), as are rows with a NULL
    * vector (nothing to measure). Ids are cast to long — the heap
    * aggregate's key contract.
    */
  def centroidOutliers(df: DataFrame, idCol: String, vecCol: String,
      groupCol: String, k: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val qdf = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"),
        col(idCol).cast("long").as("id"),
        Clustering.quantizeF(col(vecCol), scale).as("qv"))
      .filter(col("qv").isNotNull)
    val cents = groupCentroidsQ(qdf.select(col("grp"), col("qv")))
      .select(col("grp"), col("centroid"))
    val scored = qdf.join(broadcast(cents), Seq("grp"))
      .select(col("grp"), col("id"),
        ArrayOps.l2sqL(col("qv"), col("centroid")).as("dist"))
    scored.groupBy(col("grp"))
      .agg(TopK.topKPairs(col("dist"), col("id"), k).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp").as(groupCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as(idCol), col("col.ord").as("dist"))
  }

  /** Embedding-vintage drift report — the governance check behind any
    * re-embedding or new-crawl rollout: per group, the integer L2²
    * between the OLD vintage's centroid and the NEW one's, plus both
    * populations. A re-embedded corpus whose model silently changed, or
    * a crawl whose topic mix shifted, shows up as per-group centroid
    * displacement long before downstream metrics move; `flagged` marks
    * groups whose drift exceeds `maxDist` (the threshold is in the
    * same quantized-integer units as [[centroidOutliers]]' distances —
    * calibrate it from that report's typical in-group spread). Groups
    * present in only one vintage carry NULL for the missing side's
    * count and NULL dist: appearing/disappearing populations are drift
    * of the most drastic kind and must reach the report, not be
    * inner-joined away. NULL groups are excluded on BOTH sides (the
    * [[centroidOutliers]] policy — a catch-all bucket's geometry means
    * nothing, and its "drift" would be noise).
    *
    * Output: (groupCol, n_old, n_new, dist, flagged), one row per
    * group in either vintage.
    *
    * Scale shape: one map-side-combined groupBy per vintage (dim+1
    * longs per group each — never rows), then a group-cardinality
    * full-outer join. Nothing driver-side, nothing quadratic.
    */
  def centroidDrift(oldDf: DataFrame, newDf: DataFrame, vecCol: String,
      groupCol: String, maxDist: Long,
      scale: Long = 1000000L): DataFrame = {
    require(maxDist >= 0L, s"maxDist=$maxDist must be >= 0")
    def cents(df: DataFrame, nAs: String, cAs: String): DataFrame =
      groupCentroidsQ(df.filter(col(groupCol).isNotNull)
        .select(col(groupCol).as("grp"),
          Clustering.quantizeF(col(vecCol), scale).as("qv"))
        .filter(col("qv").isNotNull))
        .select(col("grp"), col("n").as(nAs), col("centroid").as(cAs))
    cents(oldDf, "n_old", "c_old")
      .join(cents(newDf, "n_new", "c_new"), Seq("grp"), "full_outer")
      .select(col("grp").as(groupCol), col("n_old"), col("n_new"),
        ArrayOps.l2sqL(col("c_old"), col("c_new")).as("dist"))
      .withColumn("flagged",
        coalesce(col("dist") > maxDist, lit(true)))
  }

  /** Integer L2² between the quantized vector column and a packed flat
    * centroid literal — shared by [[Coreset]]'s iterative min-distance
    * scan. Returns [bestIdx, bestDist]; callers read element 2 (dist).
    */
  private[operators] def nearestOfLit(qv: Column, flat: Array[Long],
      dim: Int): Column =
    ArrayOps.nearestCentroidL2F(qv, ArrayOps.packedLongLit(flat), dim)

  /** Dimension probe: one row to the driver, fails fast on empty input.
    * NULL vectors are skipped — `size(NULL)` is -1 under non-ANSI
    * semantics and would silently zero the centroid width.
    */
  private[operators] def vectorDim(qdf: DataFrame): Int = {
    val row = qdf.filter(col("qv").isNotNull)
      .select(size(col("qv")).as("d")).limit(1).collect()
    require(row.nonEmpty, "vector input is empty")
    row(0).getInt(0)
  }
}
