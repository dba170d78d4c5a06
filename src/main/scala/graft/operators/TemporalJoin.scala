package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the built-in join types don't cover: as-of (latest right
  * row at-or-before each left row) and bounded time-window self-pairing.
  *
  * Both are implemented as EQUI-joins/windows so they scale:
  *
  *  - A naive as-of is a range join (`r.time <= l.time` + per-left max) —
  *    a nested-loop or exploding sort-merge at 100 TB. [[asOf]] instead
  *    unions both sides and takes ONE window pass over (key, time): a
  *    single shuffle on the key, state per row is one running "latest
  *    right payload", nothing quadratic anywhere.
  *  - A naive within-window pair join (`0 < t2-t1 <= W`) is the same range
  *    join. [[withinWindow]] buckets time into W-sized bins and
  *    equi-joins on (key, bin) with the probe side exploded to its own
  *    and the next bin — every true pair lands in exactly one candidate
  *    bucket, and the exact predicate prunes the rest. Shuffle carries
  *    (key, bin) tuples; cost is bounded by real pair density per bin,
  *    not |left|×|right|.
  */
object TemporalJoin {

  /** As-of join: for each left row, the single latest right row with the
    * same `key` and `right.time <= left.time` (ties on time broken by the
    * largest payload struct — pass the tie-break id as the second payload
    * field to make it deterministic).
    *
    * @param rightPayload right columns carried to the output (packed into
    *   an `asof` struct, null when no right row precedes the left row —
    *   LEFT as-of semantics). `time` is compared as given; pass an
    *   already-truncated column (e.g. epoch millis) when cross-engine
    *   parity matters.
    * @return left.* plus `asof: struct(rightPayload*)`
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rSchema = right.select(rightPayload.map(col): _*).schema
    val lSchema = left.select(leftCols.map(col): _*).schema
    val l = left.select(
      col(key).as("__k"), col(time).as("__t"), lit(1).as("__tag"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(rSchema).as("__rrow"))
    val r = right.select(
      col(key).as("__k"), col(time).as("__t"), lit(0).as("__tag"),
      lit(null).cast(lSchema).as("__lrow"),
      struct(rightPayload.map(col): _*).as("__rrow"))
    // right rows sort before left rows at equal time (tag 0 < 1) => "<=";
    // among right rows the struct order makes `last` the deterministic max
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__tag").asc, col("__rrow").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__lrow.`$c`").as(c)) :+ col("asof"): _*)
  }

  /** All (a, b) pairs sharing `key` with `0 < b.time - a.time <= windowSize`
    * (same `time` unit as `windowSize`; equal-time pairs are excluded so
    * each unordered pair appears in exactly one direction).
    * Returns key, a-payload, b-payload, gap.
    */
  def withinWindow(df: DataFrame, key: String, time: String, id: String,
      windowSize: Long): DataFrame = {
    val e = df.select(col(key).as("k"), col(id).as("id"),
        col(time).cast("long").as("t"))
      .withColumn("bin", col("t")
        .divide(lit(windowSize)).cast("long"))
    // probe side explodes to (own bin, next bin): any b with
    // 0 < b.t - a.t <= W lives in a's bin or the one after
    val probe = e.select(col("k"), col("id").as("id_a"), col("t").as("t_a"),
      explode(array(col("bin"), col("bin") + 1)).as("jbin"))
    probe.join(e.select(col("k"), col("id").as("id_b"), col("t").as("t_b"),
        col("bin").as("jbin")),
      Seq("k", "jbin"))
      .filter(col("t_b") > col("t_a") &&
        col("t_b") - col("t_a") <= windowSize)
      .select(col("k"), col("id_a"), col("id_b"),
        (col("t_b") - col("t_a")).as("gap"))
  }
}
