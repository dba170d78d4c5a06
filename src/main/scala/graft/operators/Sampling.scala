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
}
