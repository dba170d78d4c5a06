package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means over an embedding column, and the
  * SemDeDup-style semantic dedup built on top of it.
  *
  * The scale problem this solves is REPRODUCIBILITY, not speed: naive
  * distributed k-means sums float coordinates in shuffle-arrival order,
  * so centroids (and therefore assignments, and therefore which
  * documents a semantic dedup DROPS from a training set) differ run to
  * run and cluster layout to cluster layout. Here every arithmetic step
  * is exact 64-bit integer math on fixed-point coordinates:
  *
  *  - quantize once: `q[i] = round(v[i] * scale)` (half-away-from-zero,
  *    identical in Spark and any IEEE replay),
  *  - distances are exact integer L2² (≤ dim·(2·scale)² « 2⁶³),
  *  - centroid updates are exact integer sums (order-independent)
  *    divided with truncating integer division.
  *
  * The result is bit-identical under any partitioning, AQE decision, or
  * executor count — proven by [[graft.ClusteringSpec]] re-running under
  * adversarial repartitioning — and exactly replayable in ANSI SQL,
  * which is what the q115/q116 oracles do.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - the corpus is never shuffled for assignment — centroids travel to
  *    the data as broadcast literals, assignment is a map-only pass;
  *  - the centroid update is a map-side-combined aggregation producing
  *    k·(dim+1) longs; the driver only ever holds k·dim values;
  *  - one corpus scan per iteration, `iters` is a small constant.
  *
  * Reference scope: the reference engine has no clustering; this is part
  * of the training-data extension surface (SemDeDup: Abbas et al. 2023,
  * arXiv:2303.09540 — semantic duplicates are found within k-means
  * clusters so the pair search is k · (n/k)² instead of n²).
  */
object Clustering {

  /** Fixed-point quantization of a float-array column: one BIGINT per
    * coordinate, `round(v[i] * scale)` half-away-from-zero.
    */
  def quantizeF(vec: Column, scale: Long): Column =
    transform(vec, x => round(x.cast("double") * lit(scale.toDouble)).cast("long"))

  /** One assignment pass: each row gets the (cluster, dist) of its
    * nearest centroid via [[graft.functions.ArrayOps.nearestCentroidL2F]]
    * — one static call walking a packed k×dim long matrix, no per-row
    * allocation. Centroids are sorted by label, so the kernel's
    * ties-to-lowest-index rule is exactly the oracle's `ORDER BY d, cl`.
    */
  private def assign(qdf: DataFrame, centroids: Seq[(Long, Seq[Long])]): DataFrame = {
    val labels = centroids.map(_._1).toArray
    val flat = centroids.flatMap(_._2).toArray
    val best = graft.functions.ArrayOps.nearestCentroidL2F(
      col("qv"), graft.functions.ArrayOps.packedLongLit(flat),
      centroids.head._2.length)
    qdf.withColumn("best", best)
      .select(col("id"),
        element_at(typedLit(labels), (col("best")(0) + 1).cast("int"))
          .as("cluster"),
        col("best")(1).as("dist"), col("qv"))
  }

  /** k-means with deterministic seeding (the k smallest ids, labelled
    * 0..k-1 in id order) and `iters` assignment rounds. Returns one row
    * per input row: (id, cluster, dist, qv). Clusters that lose every
    * member simply drop out of later rounds (their label is retired,
    * the rest keep theirs) — same behavior as the SQL replay's GROUP BY.
    */
  def fixedPointKMeans(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Long = 1000000L): DataFrame = {
    require(k >= 1 && iters >= 1, s"k=$k iters=$iters must be >= 1")
    val qdf = df.select(col(idCol).as("id"),
      quantizeF(col(vecCol), scale).as("qv"))

    // Deterministic init: bounded collect of exactly k rows.
    var centroids: Seq[(Long, Seq[Long])] =
      qdf.orderBy(col("id")).limit(k).collect().zipWithIndex.map {
        case (r, j) => (j.toLong, r.getSeq[Long](r.fieldIndex("qv")))
      }.toSeq
    require(centroids.nonEmpty, "fixedPointKMeans needs a non-empty input")
    val dim = centroids.head._2.length

    var assigned = assign(qdf, centroids)
    for (_ <- 1 until iters) {
      // Exact integer mean per surviving cluster: map-side-combined sums
      // of each coordinate (k·(dim+1) longs total), truncating division
      // on the driver — Long division truncates toward zero, exactly the
      // semantics of Spark's `div` and the oracle's `//`.
      val sums = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(i =>
            sum(element_at(col("qv"), i + 1)).as(s"s$i")): _*)
        .collect()
      centroids = sums.map { r =>
        val n = r.getAs[Long]("n")
        (r.getAs[Long]("cluster"),
          (0 until dim).map(i => r.getAs[Long](s"s$i") / n))
      }.sortBy(_._1).toSeq
      assigned = assign(qdf, centroids)
    }
    assigned
  }

  /** SemDeDup: within each k-means cluster, a row is dropped when ANY
    * smaller-id row of the same cluster is within exact quantized L2²
    * `threshold` of it — so the smallest id of every near-dup set always
    * survives, with no iterative union-find (one join, SQL-replayable).
    * Output: (id, cluster, kept) for every input row.
    *
    * The pair search joins on `cluster`, so its cost is
    * Σ_c |c|² ≈ n²/k — the SemDeDup contract is that k grows with the
    * corpus (k ≈ n/E[cluster size]) so per-cluster work stays bounded;
    * the hot-cluster failure mode is a skewed centroid, which the
    * caller controls via k, not a data-dependent explosion.
    */
  def semanticDedup(assigned: DataFrame, threshold: Long): DataFrame = {
    // The assignment plan is consumed three times (both self-join sides
    // + the final output join); persist it so the Lloyd chain behind it
    // runs once, then release the cache once the (small) result is
    // materialized — the Graph.pageRank lifecycle.
    // vector validity hoisted to ONE boolean per row: the pair filter
    // then runs the primitive (non-nullable, unboxed) L2² kernel over
    // O(n²/k) pairs instead of paying a boxed java.lang.Long return per
    // pair. A null-holding vector has ok=false and can never appear in a
    // pair — exactly the NULL-propagating semantics of the safe l2sqL /
    // the SQL oracle's list_sum (ragged pairs fall out via the kernel's
    // Long.MaxValue).
    val a = assigned.select(col("id"), col("cluster"), col("qv"),
      graft.functions.ArrayOps.vecCleanL(col("qv")).as("ok")).persist()
    val b = a.select(col("id").as("b_id"), col("cluster").as("b_cluster"),
      col("qv").as("b_qv"), col("ok").as("b_ok"))
    val dupIds = a.filter(col("ok")).join(b.filter(col("b_ok")),
        col("cluster") === col("b_cluster") && col("b_id") < col("id"))
      // codegen'd static L2² kernel — bit-identical to the
      // aggregate(zip_with(...)) HOF form, minus the interpreted
      // lambda per pair element
      .filter(graft.functions.ArrayOps.l2sqRawL(col("qv"), col("b_qv"))
        <= lit(threshold))
      .select(col("id")).distinct()
    val out = a.join(dupIds.withColumn("is_dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cluster"),
        col("is_dup").isNull.as("kept"))
      .persist()
    out.count(): Unit
    a.unpersist(blocking = false)
    out
  }
}
