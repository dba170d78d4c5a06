package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Fractional-epoch domain resampling — the "data mixture" step of a
  * training run: given a target weight per domain expressed in EPOCHS
  * (2.3 = every document of that domain appears twice, and a
  * deterministic 30% of them a third time), emit the physically
  * resampled corpus. This is the standard way published mixes are
  * specified (e.g. up-sampling a small high-quality domain to >1 epoch
  * while a crawl domain stays <1), and it composes with the rest of
  * the pipeline: feed the output through `Layout.trainingShuffle` and
  * the copies interleave into training order.
  *
  * Scale shape: the mixture table is a handful of rows — broadcast —
  * and everything else is a PROJECTION (hash, copy count, sequence
  * explode). Zero shuffles, no RNG state: the fractional keep decision
  * derives from `Layout.shuffleHash(id, seed)`, the engine-portable
  * mixer q112's oracle already replays, so the same subset of
  * documents gets the extra copy on every rerun, any cluster size, and
  * in the SQL oracle. Weights are integer MILLI-epochs so the
  * threshold compare (`h mod 1000 < epochs mod 1000`) is exact integer
  * arithmetic on both engines.
  *
  * Sub-epoch weights (< 1000 milli) mean the domain is DOWN-sampled:
  * floor(e) = 0 copies plus the hash-selected fraction — exactly the
  * "0.3 epochs of domain X" case. Domains absent from the map get
  * weight 0 (dropped); pass 1000 to keep a domain as-is.
  */
object Mixing {

  /** Resample `docs` to the target mixture. Output = input columns plus
    *  - `n_copies` — this document's total copy count under the mix;
    *  - `copy`     — 1..n_copies, one output row per copy.
    * Rows with `n_copies` = 0 are dropped.
    */
  def epochMix(docs: DataFrame, idCol: String, domainCol: String,
      epochsMilli: Map[String, Long], seed: Long): DataFrame = {
    require(epochsMilli.nonEmpty, "empty mixture")
    require(epochsMilli.values.forall(_ >= 0L),
      s"negative epochs in $epochsMilli")
    // n_copies/copy are output columns and epochs_milli is join-time
    // scratch — silently overwriting a caller's column of the same
    // name would hand downstream consumers mixer state as their data
    Seq("n_copies", "copy", "epochs_milli").foreach(r =>
      require(!docs.columns.contains(r),
        s"input already has a '$r' column — rename it before epochMix"))
    val spark = docs.sparkSession
    import spark.implicits._
    val mix = epochsMilli.toSeq.toDF(domainCol, "epochs_milli")
    val h = Layout.shuffleHash(col(idCol), seed)
    docs.join(F.broadcast(mix), Seq(domainCol))
      .withColumn("n_copies",
        expr("epochs_milli DIV 1000") +
          when(pmod(h, lit(1000L)) < col("epochs_milli") % lit(1000L),
            lit(1L)).otherwise(lit(0L)))
      .drop("epochs_milli")
      // the filter is semantic, not an optimization: Spark's
      // sequence(1, 0) infers step -1 and yields [1, 0] — two phantom
      // copies — where SQL generate_series(1, 0) is empty
      .filter(col("n_copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
  }

  /** Square-root temperature sampling shares — the step that PRODUCES a
    * mixture: given the observed per-domain document counts, compute
    * each domain's smoothed sampling share p_i ∝ √n_i (the standard
    * multilingual rebalancing rule — temperature T=2 / α=0.5 smoothing,
    * cf. mBERT/XLM exponentiated sampling, Conneau & Lample 2019
    * arXiv:1901.07291 §3.1; Raffel et al. 2020 §3.4.3 examine the same
    * family for mixing) and the integer document quota out of
    * `budget`. Small domains gain share relative to raw proportions,
    * large crawls lose it, and the output feeds [[epochMix]] directly
    * (quota·1000/n_docs = milli-epochs).
    *
    * Everything after the count is INTEGER arithmetic, so the report is
    * bit-identical across engines and replayable in SQL: √n is
    * correctly rounded by IEEE 754 (both JVM and the oracle produce the
    * same double), quantized to micro BEFORE summation (integer sum —
    * no float-association drift), and shares/quotas are integer
    * divisions of those micro weights. NULL domains count like any
    * other group (provenance-less data is exactly what a mixing report
    * must surface, the [[graft.operators.Centroids.groupCentroids]]
    * NULL policy). Output: (domainCol, n_docs, weight_micro, share_ppm,
    * quota), one row per domain.
    *
    * Scale shape: ONE map-side-combined shuffle on the domain (the
    * count), then the total is an unpartitioned window over the
    * DOMAIN-CARDINALITY counts frame — a single-partition exchange of
    * a few hundred rows, chosen deliberately over a separate global
    * aggregate, which Catalyst plans as a SECOND scan of the corpus
    * (the two aggregation subtrees differ, so ReuseExchange cannot
    * dedup them; PlanSpec pins the one-scan shape). Nothing
    * driver-side. The share/quota products run in decimal(38,0) —
    * `weight_micro · budget` overflows a long already at 10^10-doc
    * domains × 10^9-doc budgets (w≈10^11, product 10^20 > 2^63) — so
    * the op is safe for ANY long-valued counts and budgets:
    * weight_micro < 2^32·10^6 ≈ 4·10^15, times a < 2^63 budget stays
    * under 4·10^34 ≪ 10^38. Results are still integral (DIV on
    * decimals returns BIGINT), so the report is bit-identical in SQL.
    */
  def temperatureShares(docs: DataFrame, domainCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0L, s"budget=$budget must be >= 0")
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_micro",
        round(sqrt(col("n_docs").cast("double")) * 1e6).cast("long"))
    // BOUNDED-CARDINALITY window: the frame below `counts` is one row
    // per DOMAIN (the pre-aggregated mixture groups — tens, not rows),
    // so the unpartitioned window serializing through one task is a
    // few-row reduction, not a data-path sort. If domains ever became
    // high-cardinality, replace with a two-level aggregate (sum to a
    // scalar, broadcast back) — flagged by the r17 verdict, documented
    // here because the window is correct ONLY under this invariant.
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    counts
      .withColumn("w_total", sum(col("weight_micro")).over(all))
      .select(col(domainCol), col("n_docs"), col("weight_micro"),
        expr("CAST(weight_micro AS DECIMAL(38,0)) * 1000000 DIV w_total")
          .as("share_ppm"),
        expr(s"CAST(weight_micro AS DECIMAL(38,0)) * ${budget}L DIV w_total")
          .as("quota"))
  }
}
