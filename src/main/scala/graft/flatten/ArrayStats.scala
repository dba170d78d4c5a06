package graft.flatten

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch-wide array statistics (SURVEY.md §7.3).
  *
  * Spark schemas carry `ArrayType(elementType)` with no length, but the
  * flattening contract expands array-of-object columns positionally, with
  * the column set unioned across all documents (the Spark analogue of the
  * reference's pass-1 column-set union [`ElasticSearch ETL.py:171-181`]).
  *
  * Crucially the expansion width is per *indexed* path, not per schema
  * path: `lines[0].messages` and `lines[5].messages` get independent
  * widths, exactly as the reference discovers columns per concrete element
  * [`ETL.py:61-65`]. So stats are keyed by dotted raw paths with numeric
  * segments (`priceOutput.lines.3.messages`), and computed level by level:
  * one Spark aggregate job per array-nesting depth, each job computing
  * max-length + has-empty for EVERY pending indexed path at once.
  *
  * At 100 TB: D (nesting depth) extra columnar scans, each pruned to the
  * array columns only, each aggregating to a single row (partial agg —
  * bytes move, not rows). No explode, no shuffle of data rows.
  */
object ArrayStats {

  final case class Stats(maxLen: Int, hasEmpty: Boolean)

  /** An array-of-struct column whose ancestor arrays are all index-bound. */
  private final case class Pending(rawPath: String, ctx: Column,
      elem: StructType)

  /** null-safe size (independent of legacy sizeOfNull / ANSI). */
  private def sizeOf(a: Column): Column =
    when(a.isNull, lit(null).cast(IntegerType)).otherwise(size(a))

  /** Array-of-struct fields reachable from `dt` through structs only.
    * Returns (relativeRawPath, columnFromParent, elementType).
    */
  private def directArrays(get: String => Column, dt: StructType,
      prefix: String): Seq[(String, Column, StructType)] =
    dt.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case ArrayType(et: StructType, _) => Seq((p, get(f.name), et))
        case st: StructType =>
          directArrays(n => get(f.name).getField(n), st, p)
        case _ => Nil
      }
    }

  /** Compute stats for every (indexed) array-of-struct path; one aggregate
    * job per nesting level.
    */
  def collect(df: DataFrame): Map[String, Stats] = {
    val acc = collection.mutable.HashMap.empty[String, Stats]
    var pending: Seq[Pending] = directArrays(
      n => col(s"`$n`"), df.schema, "").map {
      case (p, c, et) => Pending(p, c, et)
    }
    while (pending.nonEmpty) {
      val aggCols = pending.zipWithIndex.flatMap { case (p, i) =>
        Seq(max(sizeOf(p.ctx)).as(s"m$i"),
          max((sizeOf(p.ctx) === 0).cast(IntegerType)).as(s"e$i"))
      }
      val row = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
      val resolved = pending.zipWithIndex.map { case (p, i) =>
        val m = if (row.isNullAt(2 * i)) 0 else row.getInt(2 * i)
        val e = if (row.isNullAt(2 * i + 1)) false
                else row.getInt(2 * i + 1) > 0
        acc += p.rawPath -> Stats(m, e)
        (p, m)
      }
      pending = resolved.flatMap { case (p, maxLen) =>
        (0 until maxLen).flatMap { i =>
          val elem = get(p.ctx, lit(i))
          directArrays(n => elem.getField(n), p.elem, "").map {
            case (rel, c, et) => Pending(s"${p.rawPath}.$i.$rel", c, et)
          }
        }
      }
    }
    acc.toMap
  }
}
