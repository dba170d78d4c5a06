package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional lake layout: Z-order (Morton) clustering so that
  * min/max footer pruning works on BOTH of two filter columns at once —
  * the standard data-skipping layout for 100 TB lakes (Delta/Iceberg
  * OPTIMIZE ZORDER). A lexicographic sort prunes only its leading column;
  * interleaving the bits of both keys gives every file a tight bounding
  * rectangle in (x, y) space. (Beyond-reference: the reference's only
  * layout is one flat TSV, `ElasticSearch ETL.py:247-257`.)
  */
object Layout {

  /** Morton code of two non-negative ints confined to `bits` bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Runs as the
    * NATIVE `MortonCode` expression (`functions/Morton`) — a hand-written
    * `doGenCode` magic-mask bit spread inside whole-stage codegen; the
    * compositional 16-term sum survives as `zValueComposed` (the
    * cross-check) and `zValueSql` (the engine-portable oracle form).
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    graft.functions.Morton.code(x.cast("long"), y.cast("long"), bits)

  /** The same value built compositionally from built-in shift/mask ops —
    * kept as the independent cross-check for the native expression.
    */
  def zValueComposed(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** The same Morton expression as ANSI SQL text (for oracles and
    * pushdown into engines without the operator): sum of per-bit terms.
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + " +
        s"(($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Write `df` as `numFiles` parquet files clustered by the Z-order of
    * (xCol, yCol): range-partition on the z value (sampled range bounds —
    * no skew from hot z prefixes), sort within each file so row groups
    * inherit tight bounds too. Readers filtering on EITHER column skip
    * files by footer min/max.
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      path: String, numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)
}
