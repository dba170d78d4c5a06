package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit between two versions of an
  * id-keyed table (two lake exports, a pre/post-curation pair, last
  * week's corpus vs this week's): which documents were added, removed,
  * modified, or untouched, and the per-class counts a pipeline gate
  * alerts on. CDC ([[Cdc]]) folds a CHANGELOG into a snapshot; this is
  * the inverse question — two snapshots, no changelog, recover the
  * delta.
  *
  * Shape: ONE full-outer join on the id — the minimal distributed form
  * of the question (both sides shuffle by id; on bucketed/id-sorted
  * lake layouts, e.g. [[graft.sinks.Lake.writeAnnLake]]'s, the
  * exchange elides entirely). Modification is detected column-by-column
  * with null-safe equality (`<=>`), so a value turning NULL — or
  * non-NULL — counts as modified, never as equal-by-vacuity.
  */
object Snapshot {

  /** Per-document diff: (id, change) with change ∈ added | removed |
    * modified | unchanged. `compareCols` are the value columns whose
    * change means "modified" (columns outside the list — metadata,
    * ingestion timestamps — are ignored by design).
    */
  def diff(old: DataFrame, nw: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "no columns to compare")
    // presence markers, not id-nullness, decide added/removed: a
    // NULL-id row never joins (=== is null-rejecting), so an old-only
    // NULL-id row would otherwise read its own NULL o_id as "absent
    // from old" and be classed added. With markers it is removed, a
    // new-only NULL-id row is added, and one NULL-id row on each side
    // yields one removed + one added (they are not the same document
    // by any evidence the table offers).
    val o = old.select(lit(true).as("o_present") +:
      (idCol +: compareCols).map(c => col(c).as("o_" + c)): _*)
    val n = nw.select(lit(true).as("n_present") +:
      (idCol +: compareCols).map(c => col(c).as("n_" + c)): _*)
    val same = compareCols
      .map(c => col("o_" + c) <=> col("n_" + c))
      .reduce(_ && _)
    o.join(n, col("o_" + idCol) === col("n_" + idCol), "full_outer")
      .select(
        coalesce(col("o_" + idCol), col("n_" + idCol)).as(idCol),
        when(col("o_present").isNull, "added")
          .when(col("n_present").isNull, "removed")
          .when(same, "unchanged")
          .otherwise("modified").as("change"))
  }

  /** The gate-facing rollup: one row per change class with its count
    * (classes with zero occurrences are absent — the consumer treats
    * missing as 0, exactly like any group-by).
    */
  def diffCounts(old: DataFrame, nw: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame =
    diff(old, nw, idCol, compareCols)
      .groupBy(col("change")).agg(count(lit(1)).as("n"))
}
