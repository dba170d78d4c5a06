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
    */
  def stratifiedFraction(df: DataFrame, strataCol: String,
      fraction: Double, seed: Long = 42L): DataFrame = {
    val strata = df.select(col(strataCol)).distinct()
      .collect().map(_.get(0))
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
