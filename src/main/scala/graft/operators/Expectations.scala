package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations over a table — the validation gate every
  * 100 TB ingest needs in front of it: row-count floors, null-count
  * ceilings on key columns, value-range bounds, cardinality bounds,
  * and cross-table referential integrity, evaluated as ONE aggregate
  * pass over the table (every check is an aggregate column of the same
  * `agg`, so a 50-check suite still reads the data once) plus one join
  * per referential check. The report is long-format — one row per
  * check with its measured value, bounds, and pass flag — so it lands
  * in the same lake/alerting plumbing as any other table.
  *
  * Values are BIGINT end to end (counts, or caller-scaled integers
  * like centi-units for decimal ranges) so the report replays exactly
  * in any SQL engine — no float drift in a pass/fail gate.
  */
object Expectations {

  /** One expectation: `agg` must aggregate to a BIGINT `value` with
    * `lo <= value <= hi` (either bound optional).
    */
  final case class Check(name: String, agg: Column,
      lo: Option[Long] = None, hi: Option[Long] = None) {
    require(lo.nonEmpty || hi.nonEmpty, s"check $name has no bounds")
  }

  /** Evaluate `checks` over `df` in one aggregate pass. Output:
    * (check_name, value, lo, hi, pass) — `lo`/`hi` are null when
    * unbounded, `pass` = value is non-null AND within bounds. A NULL
    * measured value (min/max over an empty table or an all-NULL
    * column) FAILS: a gate whose checks vacuously succeed on exactly
    * the degenerate inputs it exists to catch would invert its
    * purpose. Row order is the callers' check order (stack preserves
    * it); sort downstream if needed.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names")
    // names are spliced into the stack() expression below — restrict
    // them to characters that cannot break the generated SQL
    checks.foreach(c => require(c.name.matches("[A-Za-z0-9_ .-]+"),
      s"check name '${c.name}' must match [A-Za-z0-9_ .-]+"))
    val aggs = checks.map(c => c.agg.cast("long").as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one wide row -> long format without re-reading the table
    val stacked = one.select(expr(
      s"stack(${checks.size}, " +
        checks.map(c => s"'${c.name}', `${c.name}`").mkString(", ") +
        ") as (check_name, value)"))
    val lo = bound(checks.map(c => c.name -> c.lo))
    val hi = bound(checks.map(c => c.name -> c.hi))
    stacked
      .withColumn("lo", lo)
      .withColumn("hi", hi)
      .withColumn("pass",
        col("value").isNotNull &&
          coalesce(col("value") >= col("lo"), lit(true)) &&
          coalesce(col("value") <= col("hi"), lit(true)))
  }

  /** Referential-integrity check as a one-row report in the same
    * shape: `value` = number of child rows whose key has no match in
    * the parent (nulls count as orphans — a null FK is a broken
    * reference for this gate), bounds [0, maxOrphans]. One left-anti
    * join; at scale AQE picks broadcast when the parent key set fits,
    * shuffle join otherwise — both are the minimal shape for the
    * question.
    */
  def refIntegrity(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      maxOrphans: Long = 0L): DataFrame = {
    // alias both key sides so childKey == parentKey (the common
    // same-name FK/PK case) resolves instead of raising an ambiguity
    val orphans = child.select(col(childKey).as("__child_key"))
      .join(parent.select(col(parentKey).as("__parent_key")),
        col("__child_key") === col("__parent_key"), "left_anti")
      .agg(count(lit(1)).cast("long").as("value"))
    orphans.select(
      lit(name).as("check_name"), col("value"),
      lit(0L).as("lo"), lit(maxOrphans).as("hi"),
      (col("value") >= 0L && col("value") <= lit(maxOrphans)).as("pass"))
  }

  // per-check literal bound as a CASE chain — a pure projection, no
  // bounds table to join
  private def bound(bs: Seq[(String, Option[Long])]): Column =
    bs.foldLeft(lit(null).cast("long")) { case (acc, (n, b)) =>
      when(col("check_name") === n,
        b.map(lit(_).cast("long")).getOrElse(lit(null).cast("long")))
        .otherwise(acc)
    }
}
