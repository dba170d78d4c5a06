package graft.flatten

import java.io.StringWriter

import com.fasterxml.jackson.core.JsonFactory

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Direct row-walk renderer for the flatten projection — the fast path of
  * [[Flattener.flattenFast]].
  *
  * The expression path (one generated select of ~N-thousand string
  * expressions) is idiomatic and codegen'd, but for a 5k-column dynamic
  * schema it pays (a) tens of seconds of Janino compilation per distinct
  * schema and (b) interpreted higher-order-function evaluation inside the
  * JSON-array cells. This renderer walks each document row ONCE, depth-
  * first, filling the output slots directly — O(nodes) per row with zero
  * codegen — and must produce byte-identical output to the expression path
  * (pinned by FlattenerEquivalenceSpec on the golden doc and generated
  * batches).
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
  /** Walk a struct value: (field ordinal, child). */
  private final case class StructWalk(fields: Array[(Int, Node)]) extends Node
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
      slots: Map[String, Int], maxDepth: Int): Node = {

    def struct(st: StructType, pascalParent: String, rawParent: String,
        depth: Int): Node = {
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
        emit(winner.dataType, pPath, rPath, depth, ord) match {
          case Skip => None
          case n => Some((ord, n))
        }
      }
      if (children.isEmpty) Skip else StructWalk(children.toArray)
    }

    def emit(dt: DataType, pPath: String, rPath: String, depth: Int,
        ord: Int): Node = dt match {
      case st: StructType =>
        if (depth + 1 > maxDepth) slotOf(pPath, st)
        else struct(st, pPath, rPath, depth + 1)
      case ArrayType(et: StructType, _) =>
        val s = stats.getOrElse(rPath, ArrayStats.Stats(0, hasEmpty = false))
        val unindexed =
          if (s.hasEmpty || s.maxLen == 0) slots.getOrElse(pPath, -1) else -1
        val elems = (0 until s.maxLen).map { i =>
          val ip = PathNaming.indexed(pPath, i)
          if (depth + 1 > maxDepth) slotOf(ip, et)
          else struct(et, ip, s"$rPath.$i", depth + 1)
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

  private def eval(node: Node, v: Any, out: Array[String]): Unit = {
    if (v == null) return
    node match {
      case StructWalk(fields) =>
        val r = v.asInstanceOf[Row]
        var i = 0
        while (i < fields.length) {
          eval(fields(i)._2, r.get(fields(i)._1), out)
          i += 1
        }
      case ArrayWalk(unindexedSlot, elems, et) =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        if (unindexedSlot >= 0)
          out(unindexedSlot) = pyJson(v, ArrayType(et))
        var i = 0
        val n = math.min(xs.length, elems.length)
        while (i < n) {
          eval(elems(i), xs(i), out)
          i += 1
        }
      case Leaf(slot, dt) => out(slot) = pyScalar(v, dt)
      case JsonCell(slot, dt) => out(slot) = pyJson(v, dt)
      case Skip => ()
    }
  }

  /** Python str(v) — must mirror [[PyFormat.pyStr]]. */
  private def pyScalar(v: Any, dt: DataType): String = dt match {
    case BooleanType => if (v.asInstanceOf[Boolean]) "True" else "False"
    case DoubleType => PyFormat.pyRepr(v.asInstanceOf[Double])
    case FloatType => PyFormat.pyRepr(v.asInstanceOf[Float].toDouble)
    case _ => String.valueOf(v)
  }

  /** json.dumps-style cell — must mirror [[PyFormat.pyJson]]:
    * arrays with ", " separators and lowercase literals; structs via a
    * Jackson generator exactly like Spark's to_json (compact, schema
    * order, nulls dropped).
    */
  private def pyJson(v: Any, dt: DataType): String = {
    if (v == null) return "null"
    dt match {
      case ArrayType(et, _) =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]]
        val sb = new java.lang.StringBuilder("[")
        var i = 0
        while (i < xs.length) {
          if (i > 0) sb.append(", ")
          sb.append(pyJson(xs(i), et))
          i += 1
        }
        sb.append("]").toString
      case st: StructType => jacksonStruct(v.asInstanceOf[Row], st)
      case BooleanType =>
        if (v.asInstanceOf[Boolean]) "true" else "false"
      case DoubleType => PyFormat.pyRepr(v.asInstanceOf[Double])
      case FloatType => PyFormat.pyRepr(v.asInstanceOf[Float].toDouble)
      case StringType =>
        // mirror PyFormat.jsonEscape (backslash, quote, \n \r \t)
        val s = v.toString
          .replace("\\", "\\\\").replace("\"", "\\\"")
          .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        "\"" + s + "\""
      case _ => String.valueOf(v)
    }
  }

  private val jsonFactory = new JsonFactory()

  private def jacksonStruct(row: Row, st: StructType): String = {
    val w = new StringWriter()
    val g = jsonFactory.createGenerator(w)
    writeStruct(g, row, st)
    g.close()
    w.toString
  }

  private def writeStruct(g: com.fasterxml.jackson.core.JsonGenerator,
      row: Row, st: StructType): Unit = {
    g.writeStartObject()
    var i = 0
    while (i < st.fields.length) {
      val v = row.get(i)
      if (v != null) { // to_json drops null fields (ignoreNullFields)
        g.writeFieldName(st.fields(i).name)
        writeValue(g, v, st.fields(i).dataType)
      }
      i += 1
    }
    g.writeEndObject()
  }

  private def writeValue(g: com.fasterxml.jackson.core.JsonGenerator,
      v: Any, dt: DataType): Unit = dt match {
    case st: StructType => writeStruct(g, v.asInstanceOf[Row], st)
    case ArrayType(et, _) =>
      g.writeStartArray()
      v.asInstanceOf[scala.collection.Seq[Any]].foreach { x =>
        if (x == null) g.writeNull() else writeValue(g, x, et)
      }
      g.writeEndArray()
    case BooleanType => g.writeBoolean(v.asInstanceOf[Boolean])
    case DoubleType => g.writeNumber(v.asInstanceOf[Double])
    case FloatType => g.writeNumber(v.asInstanceOf[Float])
    case LongType => g.writeNumber(v.asInstanceOf[Long])
    case IntegerType => g.writeNumber(v.asInstanceOf[Int])
    case _ => g.writeString(String.valueOf(v))
  }

  // ---- public entry -------------------------------------------------------------

  /** Render straight to TSV lines (reference sink conventions: minimal
    * quoting, doubled quotes, empty cells unquoted). Skips the
    * DataFrame/Row round-trip entirely — `createDataFrame` over a
    * 5k-string schema costs another multi-second RowEncoder compilation
    * that a sink-bound job never needs.
    */
  def renderTsvLines(df: DataFrame, stats: Map[String, ArrayStats.Stats],
      columns: Seq[String], maxDepth: Int): org.apache.spark.rdd.RDD[String] = {
    val schema = df.schema
    val slots = columns.zipWithIndex.toMap
    val plan = compile(schema, stats, slots, maxDepth)
    val n = columns.length
    df.rdd.mapPartitions { it =>
      it.map { row =>
        val out = new Array[String](n)
        java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], "")
        eval(plan, row, out)
        tsvLine(out)
      }
    }
  }

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
    val schema = df.schema
    val slots = columns.zipWithIndex.toMap
    val plan = compile(schema, stats, slots, maxDepth)
    val n = columns.length
    val rdd = df.rdd.mapPartitions { it =>
      it.map { row =>
        val out = new Array[String](n)
        java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], "")
        eval(plan, row, out)
        Row.fromSeq(out.toIndexedSeq)
      }
    }
    spark.createDataFrame(rdd,
      StructType(columns.map(c => StructField(c, StringType, nullable = false))))
  }
}
