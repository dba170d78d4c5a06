package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar-feature distribution drift between two corpus vintages — the
  * numeric complement of [[Centroids.centroidDrift]]: per group, an
  * exact Kolmogorov–Smirnov-style statistic over an integer value grid
  * (doc lengths, quality scores, token counts — "did this crawl's
  * length distribution shift?" is the first question a curation
  * rollout review asks).
  *
  * Exactness contract (the q115/q124 fixed-point discipline): the grid
  * is `gridSize` equally-spaced integer cut points over the UNION
  * min/max (integer arithmetic, both engines identical); per side the
  * ECDF is evaluated as exact integer counts `value <= cut`; and the
  * divergence is compared CROSS-MULTIPLIED — `ks_num = max_i
  * |c1_i·n2 − c2_i·n1|`, the KS statistic scaled by n1·n2 — so no
  * float division ever happens and the report is bit-identical in SQL.
  * `flagged` marks groups where `ks_num · 1e6 > thresholdPpm · n1 · n2`
  * (i.e. KS > threshold). Groups present on one side only carry NULL
  * for the missing side and flag true — appearing/disappearing
  * populations are drift of the most drastic kind ([[Centroids
  * .centroidDrift]]'s rule); NULL groups are excluded on both sides.
  *
  * Scale shape: the global min/max is one row to the driver (two
  * scans' worth of agg, map-side combined); each side then reduces in
  * ONE map-side-combined aggregate per group — the `gridSize`
  * conditional counts ride as one `sum(when(...))` each, so the
  * shuffle carries groups × (gridSize+1) longs, never rows — followed
  * by a group-cardinality full-outer join. A windowless, sort-free
  * exact ECDF: the classical KS scan needs a total order; evaluating
  * only at grid cuts trades resolution bounded by 1/gridSize for a
  * fully map-side plan, the right trade at 100 TB.
  *
  * Bound: the cross-multiplied products live in a long, so a single
  * GROUP may hold at most ~3×10⁹ rows per side (n1·n2 < 2⁶³); beyond
  * that ANSI arithmetic fails loudly rather than wrapping — shard or
  * sample such a group before comparing (a KS at that population is
  * insensitive to sampling anyway). The `flagged` comparison itself
  * runs in decimal(38,0) — `ks_num·10⁶` and `thresholdPpm·n1·n2` can
  * each exceed 2⁶³ by the ppm factor while ks_num is still fine — so
  * the flag holds over the SAME n1·n2 < 2⁶³ domain as the statistic,
  * not a 10⁶-times-smaller one.
  */
object Drift {

  def distributionDrift(oldDf: DataFrame, newDf: DataFrame,
      valueCol: String, groupCol: String, gridSize: Int = 16,
      thresholdPpm: Long = 100000L): DataFrame = {
    require(gridSize >= 1, s"gridSize=$gridSize must be >= 1")
    require(thresholdPpm >= 0L, s"thresholdPpm=$thresholdPpm must be >= 0")
    def side(df: DataFrame) = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
    val a = side(oldDf)
    val b = side(newDf)
    // one bounded row: the union's value range (grid identical for
    // both sides by construction — a per-side grid would make the
    // statistic incomparable)
    val range = a.unionByName(b).agg(
      min(col("v")).as("lo"), max(col("v")).as("hi")).collect()(0)
    require(!range.isNullAt(0), "distributionDrift: no non-null values")
    val lo = range.getLong(0)
    val hi = range.getLong(1)
    // integer cut points: lo + (hi-lo)*i/gridSize for i in 1..gridSize
    // (the last cut is hi, so the final count is the group total; the
    // max over cuts is then a true KS over the grid resolution)
    val cuts: Seq[Long] =
      (1 to gridSize).map(i => lo + (hi - lo) * i / gridSize).distinct
    def ecdf(df: DataFrame, nAs: String, pfx: String) = df
      .groupBy(col("grp"))
      .agg(count(lit(1)).as(nAs),
        cuts.zipWithIndex.map { case (c, i) =>
          sum(when(col("v") <= c, 1L).otherwise(0L)).as(s"$pfx$i")
        }: _*)
    val e1 = ecdf(a, "n_old", "a")
    val e2 = ecdf(b, "n_new", "b")
    // one-sided groups keep ks_num NULL (no padding literal): a
    // NULL-propagating product per cut, greatest over all-null = null
    val diffs = cuts.indices.map { i =>
      abs(col(s"a$i") * col("n_new") - col(s"b$i") * col("n_old"))
    }
    val ksNum: Column =
      if (diffs.length == 1) diffs.head else greatest(diffs: _*)
    e1.join(e2, Seq("grp"), "full_outer")
      .select(col("grp").as(groupCol), col("n_old"), col("n_new"),
        ksNum.as("ks_num"))
      .withColumn("flagged",
        coalesce(col("ks_num").cast("decimal(38,0)") * lit(1000000L) >
          lit(thresholdPpm).cast("decimal(38,0)") *
            col("n_old") * col("n_new"), lit(true)))
  }
}
