package graft.flatten

import java.io.StringWriter

import com.fasterxml.jackson.core.JsonFactory

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Direct row-walk renderer for the flatten projection — the fast path of
  * [[Flattener.flattenFast]]/[[Flattener.flattenToTsv]].
  *
  * The expression path (one generated select of ~N-thousand string
  * expressions) is idiomatic and codegen'd, but for a 5k-column dynamic
  * schema it pays (a) tens of seconds of Janino compilation per distinct
  * schema and (b) interpreted higher-order-function evaluation inside the
  * JSON-array cells. This renderer walks each document's Tungsten row ONCE
  * (`queryExecution.toRdd`; external-Row conversion alone costs seconds
  * per pass at this width), depth-first, filling the output slots directly
  * — O(nodes) per row with zero codegen — and must produce byte-identical
  * output to the expression path (pinned by FlattenerEquivalenceSpec on
  * the golden doc and generated batches).
  *
  * Cell semantics replicated exactly: '' for missing/null, [[PyFormat]]
  * scalar/array rendering (json.dumps `", "` separators, lowercase JSON
  * literals, pyRepr doubles), Spark-`to_json`-compatible struct cells
  * (compact separators, schema field order, null fields dropped — via the
  * same Jackson generator Spark uses).
  */
object RenderPass {

  // ---- render plan ----------------------------------------------------------

  private sealed trait Node extends Serializable
  /** Walk a struct value with `numFields` fields: (field ordinal, child). */
  private final case class StructWalk(numFields: Int,
      fields: Array[(Int, Node)]) extends Node
  /** Positionally-expanded array of structs. */
  private final case class ArrayWalk(unindexedSlot: Int,
      elems: Array[Node], elemType: StructType) extends Node
  /** Terminal scalar leaf. */
  private final case class Leaf(slot: Int, dt: DataType) extends Node
  /** Terminal JSON cell (primitive/nested array, empty-only array,
    * depth-truncated subtree).
    */
  private final case class JsonCell(slot: Int, dt: DataType) extends Node
  private case object Skip extends Node

  /** Compile a render plan mirroring [[Flattener.candidates]]' traversal;
    * `slots` maps pascal path → output column position.
    */
  private def compile(schema: StructType, stats: Map[String, ArrayStats.Stats],
      slots: Map[String, Int], maxDepth: Int): StructWalk = {

    def struct(st: StructType, pascalParent: String, rawParent: String,
        depth: Int): StructWalk = {
      val children = st.fields.zipWithIndex.groupBy {
        case (f, _) => PathNaming.toPascal(f.name)
      }.toSeq.flatMap { case (pascal, group) =>
        val (winner, ord) =
          if (group.length == 1) group(0)
          else {
            val w = PathNaming.collisionWinner(pascal,
              group.map(_._1.name).toSeq)
            group.find(_._1.name == w).getOrElse(group(0))
          }
        val pPath = PathNaming.join(pascalParent, pascal)
        val rPath =
          if (rawParent.isEmpty) winner.name
          else s"$rawParent.${winner.name}"
        emit(winner.dataType, pPath, rPath, depth) match {
          case Skip => None
          case n => Some((ord, n))
        }
      }
      StructWalk(st.length, children.toArray)
    }

    def emit(dt: DataType, pPath: String, rPath: String,
        depth: Int): Node = dt match {
      case st: StructType =>
        if (depth + 1 > maxDepth) slotOf(pPath, st)
        else {
          val sw = struct(st, pPath, rPath, depth + 1)
          if (sw.fields.isEmpty) Skip else sw
        }
      case ArrayType(et: StructType, _) =>
        val s = stats.getOrElse(rPath, ArrayStats.Stats(0, hasEmpty = false))
        val unindexed =
          if (s.hasEmpty || s.maxLen == 0) slots.getOrElse(pPath, -1) else -1
        val elems = (0 until s.maxLen).map { i =>
          val ip = PathNaming.indexed(pPath, i)
          if (depth + 1 > maxDepth) slotOf(ip, et)
          else {
            val sw = struct(et, ip, s"$rPath.$i", depth + 1)
            if (sw.fields.isEmpty) Skip else sw
          }
        }.toArray
        if (unindexed < 0 && elems.forall(_ == Skip)) Skip
        else ArrayWalk(unindexed, elems, et)
      case at: ArrayType => slotOf(pPath, at)
      case other =>
        slots.get(pPath) match {
          case Some(sl) => Leaf(sl, other)
          case None => Skip
        }
    }

    def slotOf(pPath: String, dt: DataType): Node =
      slots.get(pPath) match {
        case Some(sl) => JsonCell(sl, dt)
        case None => Skip
      }

    struct(schema, "", "", 0)
  }

  // ---- row evaluation ---------------------------------------------------------

  /** Evaluate the field `ord` of container `c` (InternalRow or ArrayData —
    * both are SpecializedGetters with a positional API).
    */
  private def evalField(node: Node, c: SpecializedGetters, ord: Int,
      out: Array[String]): Unit = {
    if (node == Skip || c.isNullAt(ord)) return
    node match {
      case StructWalk(numFields, fields) =>
        val r = c.getStruct(ord, numFields)
        var i = 0
        while (i < fields.length) {
          evalField(fields(i)._2, r, fields(i)._1, out)
          i += 1
        }
      case ArrayWalk(unindexedSlot, elems, et) =>
        val xs = c.getArray(ord)
        if (unindexedSlot >= 0)
          out(unindexedSlot) = pyJsonArrayOfStruct(xs, et)
        var i = 0
        val n = math.min(xs.numElements(), elems.length)
        while (i < n) {
          evalField(elems(i), xs, i, out)
          i += 1
        }
      case Leaf(slot, dt) => out(slot) = pyScalar(c, ord, dt)
      case JsonCell(slot, dt) => out(slot) = pyJson(c, ord, dt)
      case Skip => ()
    }
  }

  /** Python str(v) — must mirror [[PyFormat.pyStr]]. */
  private def pyScalar(c: SpecializedGetters, ord: Int, dt: DataType): String =
    dt match {
      case BooleanType => if (c.getBoolean(ord)) "True" else "False"
      case DoubleType => PyFormat.pyRepr(c.getDouble(ord))
      case FloatType => PyFormat.pyRepr(c.getFloat(ord).toDouble)
      case LongType => java.lang.Long.toString(c.getLong(ord))
      case IntegerType => java.lang.Integer.toString(c.getInt(ord))
      case StringType => c.getUTF8String(ord).toString
      case other => String.valueOf(c.get(ord, other))
    }

  /** json.dumps-style cell — must mirror [[PyFormat.pyJson]]:
    * arrays with ", " separators and lowercase literals; structs via a
    * Jackson generator exactly like Spark's to_json (compact, schema
    * order, nulls dropped).
    */
  private def pyJson(c: SpecializedGetters, ord: Int, dt: DataType): String =
    dt match {
      case ArrayType(et, _) =>
        val xs = c.getArray(ord)
        val sb = new java.lang.StringBuilder("[")
        var i = 0
        while (i < xs.numElements()) {
          if (i > 0) sb.append(", ")
          if (xs.isNullAt(i)) sb.append("null")
          else sb.append(pyJson(xs, i, et))
          i += 1
        }
        sb.append("]").toString
      case st: StructType => jacksonStruct(c.getStruct(ord, st.length), st)
      case BooleanType => if (c.getBoolean(ord)) "true" else "false"
      case DoubleType => PyFormat.pyRepr(c.getDouble(ord))
      case FloatType => PyFormat.pyRepr(c.getFloat(ord).toDouble)
      case LongType => java.lang.Long.toString(c.getLong(ord))
      case IntegerType => java.lang.Integer.toString(c.getInt(ord))
      case StringType =>
        // mirror PyFormat.jsonEscape (backslash, quote, \n \r \t)
        val s = c.getUTF8String(ord).toString
          .replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        "\"" + s + "\""
      case other => String.valueOf(c.get(ord, other))
    }

  private def pyJsonArrayOfStruct(xs: ArrayData, et: StructType): String = {
    val sb = new java.lang.StringBuilder("[")
    var i = 0
    while (i < xs.numElements()) {
      if (i > 0) sb.append(", ")
      if (xs.isNullAt(i)) sb.append("null")
      else sb.append(jacksonStruct(xs.getStruct(i, et.length), et))
      i += 1
    }
    sb.append("]").toString
  }

  private val jsonFactory = new JsonFactory()

  private def jacksonStruct(row: InternalRow, st: StructType): String = {
    val w = new StringWriter()
    val g = jsonFactory.createGenerator(w)
    writeStruct(g, row, st)
    g.close()
    w.toString
  }

  private def writeStruct(g: com.fasterxml.jackson.core.JsonGenerator,
      row: InternalRow, st: StructType): Unit = {
    g.writeStartObject()
    var i = 0
    while (i < st.fields.length) {
      if (!row.isNullAt(i)) { // to_json drops null fields (ignoreNullFields)
        g.writeFieldName(st.fields(i).name)
        writeValue(g, row, i, st.fields(i).dataType)
      }
      i += 1
    }
    g.writeEndObject()
  }

  private def writeValue(g: com.fasterxml.jackson.core.JsonGenerator,
      c: SpecializedGetters, ord: Int, dt: DataType): Unit = dt match {
    case st: StructType => writeStruct(g, c.getStruct(ord, st.length), st)
    case ArrayType(et, _) =>
      g.writeStartArray()
      val xs = c.getArray(ord)
      var i = 0
      while (i < xs.numElements()) {
        if (xs.isNullAt(i)) g.writeNull() else writeValue(g, xs, i, et)
        i += 1
      }
      g.writeEndArray()
    case BooleanType => g.writeBoolean(c.getBoolean(ord))
    case DoubleType => g.writeNumber(c.getDouble(ord))
    case FloatType => g.writeNumber(c.getFloat(ord))
    case LongType => g.writeNumber(c.getLong(ord))
    case IntegerType => g.writeNumber(c.getInt(ord))
    case StringType => g.writeString(c.getUTF8String(ord).toString)
    case other => g.writeString(String.valueOf(c.get(ord, other)))
  }

  // ---- public entry -------------------------------------------------------------

  private def renderedRows(df: DataFrame,
      stats: Map[String, ArrayStats.Stats], columns: Seq[String],
      maxDepth: Int): RDD[Array[String]] = {
    val schema = df.schema
    val slots = columns.zipWithIndex.toMap
    val plan = compile(schema, stats, slots, maxDepth)
    val n = columns.length
    df.queryExecution.toRdd.mapPartitions { it =>
      it.map { row =>
        val out = new Array[String](n)
        java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], "")
        var i = 0
        while (i < plan.fields.length) {
          evalField(plan.fields(i)._2, row, plan.fields(i)._1, out)
          i += 1
        }
        out
      }
    }
  }

  /** Render straight to TSV lines (reference sink conventions: minimal
    * quoting, doubled quotes, empty cells unquoted). Skips the
    * DataFrame/Row round-trip entirely — `createDataFrame` over a
    * 5k-string schema costs another multi-second RowEncoder compilation
    * that a sink-bound job never needs.
    */
  def renderTsvLines(df: DataFrame, stats: Map[String, ArrayStats.Stats],
      columns: Seq[String], maxDepth: Int): RDD[String] =
    renderedRows(df, stats, columns, maxDepth).map(tsvLine)

  /** One TSV line with pandas/Spark-CSV minimal quoting: quote only when a
    * cell contains tab/quote/newline; inner quotes double.
    */
  def tsvLine(vals: Array[String]): String = {
    val sb = new java.lang.StringBuilder(vals.length * 8)
    var i = 0
    while (i < vals.length) {
      if (i > 0) sb.append('\t')
      val v = vals(i)
      if (v.indexOf('\t') >= 0 || v.indexOf('"') >= 0 ||
          v.indexOf('\n') >= 0 || v.indexOf('\r') >= 0) {
        sb.append('"').append(v.replace("\"", "\"\"")).append('"')
      } else sb.append(v)
      i += 1
    }
    sb.toString
  }

  /** Render the flattened all-string frame for `df` given the batch stats
    * and the final (sorted, presence-filtered) column list.
    */
  def render(df: DataFrame, stats: Map[String, ArrayStats.Stats],
      columns: Seq[String], maxDepth: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    val rdd = renderedRows(df, stats, columns, maxDepth)
      .map(a => Row.fromSeq(a.toIndexedSeq))
    spark.createDataFrame(rdd,
      StructType(columns.map(c => StructField(c, StringType, nullable = false))))
  }
}
