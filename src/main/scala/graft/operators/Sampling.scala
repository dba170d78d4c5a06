package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data mixture construction.
  *
  * Two members with different determinism contracts:
  *  - [[stratifiedFraction]] — Bernoulli per-stratum sampling
  *    (`df.stat.sampleBy`): cheap, single-pass, but row counts are
  *    binomial, not exact, and the selection depends on Spark's internal
  *    sampler — fine for quick mixes, not reproducible cross-engine.
  *  - [[stratifiedQuota]] — EXACT per-stratum quotas with a deterministic
  *    pseudo-random order (md5 of the id), so the same rows are chosen by
  *    any engine that can hash: the reproducible way to cut a balanced
  *    training mix. One shuffle (the per-stratum window); at 100 TB the
  *    ranking state per stratum is one counter, and nothing but
  *    (stratum, hash, id) moves if callers project before sampling.
  */
object Sampling {

  /** Per-stratum Bernoulli sample at `fraction` (same fraction for every
    * stratum; use `df.stat.sampleBy` directly for per-stratum rates).
    *
    * `sampleBy` needs the driver-side stratum→fraction map, so the
    * distinct strata are collected — which is only safe for a LOW-
    * cardinality stratum (language, source, shard). A caller passing a
    * doc-id-like column would OOM the driver, so the collect is bounded:
    * more than `maxStrata` distinct values fails fast with a clear
    * message instead of dying in block transfer. The count costs one
    * map-side-combined aggregate over the stratum column only.
    */
  def stratifiedFraction(df: DataFrame, strataCol: String,
      fraction: Double, seed: Long = 42L,
      maxStrata: Int = 100000): DataFrame = {
    // limit(maxStrata + 1) bounds the collect itself: the guard never
    // pulls more than one row over the limit, whatever the cardinality
    val strata = df.select(col(strataCol)).distinct()
      .limit(maxStrata + 1).collect().map(_.get(0))
    require(strata.length <= maxStrata,
      s"stratifiedFraction: over $maxStrata distinct values in " +
        s"'$strataCol' — not a stratum column; use stratifiedQuota or " +
        "sample() for high-cardinality keys")
    df.stat.sampleBy(strataCol,
      strata.map(s => s -> fraction).toMap, seed)
  }

  /** Exactly `quota` rows per stratum, chosen by ascending
    * `md5(cast(id as string))` (ties broken by id) — a deterministic
    * engine-portable shuffle order. Returns the sampled rows with their
    * `__rank` dropped.
    */
  def stratifiedQuota(df: DataFrame, strataCol: String, idCol: String,
      quota: Int): DataFrame = {
    val order: Column = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(order.asc, col(idCol).asc)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= quota)
      .drop("__rank")
  }

  /** APPLY a produced mixture: per domain, keep the top-`quota` rows by
    * (scoreCol DESC, id ASC), where quotas come from a PER-DOMAIN TABLE
    * — the consumption side of [[Mixing.temperatureShares]] (produce
    * shares/quotas) and the policy cousin of [[stratifiedQuota]]
    * (which takes one constant quota and a hash order; a real mixture
    * keeps each domain's BEST-scored documents up to ITS quota).
    * Output: (domainCol, rank, idCol, scoreCol), rank 1..quota. Rows
    * whose domain is NULL or absent from the quota table are dropped —
    * provenance-less data has no quota ([[Mixing.epochMix]]'s rule); a
    * domain whose quota exceeds its population returns the whole
    * domain.
    *
    * Scale shape: NO per-domain window sort — ranking runs through the
    * bounded-heap aggregate ([[graft.functions.TopK]]) at k = the
    * LARGEST quota (one bounded one-row collect from the
    * domain-cardinality quota table), so at most maxQuota (ord, id)
    * pairs per domain per mapper reach the one shuffle; per-domain
    * trimming to the exact quota is a broadcast join + filter after
    * the explode. Ids and scores are cast to long (the heap contract;
    * scores follow the repo's integer-score convention).
    */
  def quotaCappedBest(df: DataFrame, domainCol: String, idCol: String,
      scoreCol: String, quotas: DataFrame,
      quotaCol: String = "quota"): DataFrame = {
    val q = quotas.select(col(domainCol), col(quotaCol).cast("long")
      .as("__quota")).filter(col("__quota") > 0L)
    val maxQ = q.agg(max(col("__quota"))).collect()(0)
    // every quota zero/absent: k=1 keeps the schema; the inner join
    // against the now-empty quota table yields the empty selection
    val k = if (maxQ.isNullAt(0)) 1
      else math.min(maxQ.getLong(0), Int.MaxValue.toLong).toInt
    val ranked = df
      .filter(col(domainCol).isNotNull)
      .select(col(domainCol), col(idCol).cast("long").as("__id"),
        col(scoreCol).cast("long").as("__score"))
      .groupBy(col(domainCol))
      .agg(graft.functions.TopK.topKPairs(col("__score"), col("__id"), k)
        .as("top"))
      .select(col(domainCol), posexplode(col("top")))
      .select(col(domainCol), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as(idCol), col("col.ord").as(scoreCol))
    ranked.join(broadcast(q), Seq(domainCol))
      .filter(col("rank") <= col("__quota"))
      .drop("__quota")
  }
}
