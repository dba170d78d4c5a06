package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT quantiles over discrete numeric domains — the complement of
  * the Greenwald-Khanna sketch (approximate, any domain): when the
  * value domain is bounded (prices in cents, token counts, scores),
  * the exact distribution fits in a per-value count table, and exact
  * order statistics need ONE map-side-combined aggregation over the
  * data plus a window over the tiny distinct-value table — no global
  * sort of the rows, no sketch error. At 100 TB of lineitems the
  * shuffle carries |distinct values| counts per group, not rows.
  *
  * Semantics (discrete, no interpolation — `percentile_disc`): the
  * q-quantile of a group with n rows is the value at ordered position
  * `ceil(q·n)` (1-based) of its multiset — the smallest value whose
  * cumulative count reaches q·n. Integer-exact given integer values:
  * `ceil(q·n)` is computed in exact arithmetic from the per-mille
  * quantile (q‰ · n + 999) div 1000, so the oracle replays the
  * identical expression with no float comparison anywhere.
  *
  * Output: one row per (group, quantile‰): (group..., q_permille,
  * value).
  */
object Quantiles {

  /** Exact per-group discrete quantiles of integral column `valueCol`.
    * `quantilesPermille` are quantiles in PER-MILLE (500 = median,
    * 990 = p99) so position arithmetic stays integral end to end.
    */
  def exactDiscrete(df: DataFrame, groupCols: Seq[String],
      valueCol: String, quantilesPermille: Seq[Int]): DataFrame = {
    require(quantilesPermille.nonEmpty &&
      quantilesPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be 1..1000 permille, got $quantilesPermille")
    val gcols = groupCols.map(col)

    // exact distribution: one count per (group, value) — the only pass
    // over the data, map-side combined. NULL values are excluded FIRST
    // (percentile_disc semantics: NULLs don't count toward n and can
    // never be a quantile value; unfiltered they'd sort before every
    // value and shift low quantiles)
    val dist = df.filter(col(valueCol).isNotNull)
      .groupBy((gcols :+ col(valueCol).cast("long")
        .as("v")): _*)
      .agg(count(lit(1)).as("c"))

    // cumulative counts over the (tiny) per-group value table
    val w = Window.partitionBy(gcols: _*).orderBy(col("v"))
    val cum = dist
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(gcols: _*)))

    // for each requested quantile: the smallest v with cum >= ceil(q·n/1000)
    // (cum·1000 >= q·n ⟺ cum >= ⌈q·n/1000⌉ for integer cum — no floats)
    import df.sparkSession.implicits._
    // BIGINT like every other integer output (oracle type contract)
    val qdf = quantilesPermille.map(_.toLong).toDF("q_permille")
    val quantiles = cum.crossJoin(broadcast(qdf))
      .filter(col("cum") * 1000 >= col("q_permille") * col("n"))
      .groupBy((gcols :+ col("q_permille")): _*)
      .agg(min(col("v")).as("value"))

    // group preservation: percentile_disc IGNORES nulls but still
    // RETURNS every group — an all-NULL group yields (group, q, NULL),
    // it does not vanish. The NULL-filtered dist above loses such
    // groups, so re-seed from the distinct group universe (tiny: the
    // group table) and left-join the computed quantiles back on.
    if (groupCols.isEmpty) quantiles
    else {
      // null-safe equality: a NULL group KEY is a regular group to
      // percentile_disc (only NULL *values* are ignored). A plain
      // equi-join would never match the computed quantile row back to
      // a NULL-keyed seed row and return value=NULL for a group that
      // has one.
      val seed = df.select(gcols: _*).distinct()
        .crossJoin(broadcast(qdf))
      val joinKeys = groupCols :+ "q_permille"
      val cond = joinKeys.map(k => seed(k) <=> quantiles(k)).reduce(_ && _)
      seed.join(quantiles, cond, "left")
        .select(joinKeys.map(seed(_)) :+ quantiles("value"): _*)
    }
  }
}
