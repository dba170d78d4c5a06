package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event pattern matching (funnel analysis): which entities
  * performed steps s1, s2, …, sk as a SUBSEQUENCE of their event history
  * (other events may interleave)? The MATCH_RECOGNIZE shape, built from
  * primitives Spark codegens: per-key sort-free aggregation + one regex.
  * (Beyond-reference operator for behavioral cohort extraction.)
  *
  * Design: collect_list(struct(orderCols…, step)) is an UNORDERED
  * aggregation (one shuffle, map-side combined — no window sort);
  * array_sort on the packed struct restores the per-key total order
  * AFTER the shuffle, locally per row. The step sequence then becomes a
  * space-joined string tested with one non-backtracking-safe regex
  * `s1.*s2.*…` — correct whenever no step name is a substring of
  * another (funnel steps are categorical labels, so this holds; assert
  * it rather than silently mis-match).
  *
  * Scale: ONE shuffle of (key, order, step) triples — no bodies, no
  * window partition sort, per-key state bounded by that key's history.
  */
object Funnel {

  /** Per `keyCol` entity: its full ordered step count and whether
    * `steps` occurs as a subsequence of its `stepCol` history ordered by
    * `orderCols` (ties must be broken by the caller's orderCols for
    * determinism). Output: (keyCol, n_events, converted).
    */
  def converted(events: DataFrame, keyCol: String, stepCol: String,
      orderCols: Seq[String], steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(orderCols.nonEmpty, "orderCols must define a per-key order")
    for (a <- steps; b <- steps if a != b)
      require(!b.contains(a),
        s"step '$a' is a substring of step '$b': regex match would be wrong")
    val packed = struct(orderCols.map(col) :+ col(stepCol).as("s"): _*)
    val pattern = steps.map(java.util.regex.Pattern.quote).mkString(".*")
    events
      .groupBy(col(keyCol))
      .agg(collect_list(packed).as("h"))
      .select(col(keyCol),
        size(col("h")).cast("long").as("n_events"),
        array_join(transform(array_sort(col("h")), x => x("s")), " ")
          .rlike(pattern).as("converted"))
  }
}
