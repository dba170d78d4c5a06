package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.CatalystBridge

/** Exact per-group top-k as a native Catalyst aggregate — the
  * TypedImperativeAggregate rung of the extension ladder (the typed
  * [[org.apache.spark.sql.expressions.Aggregator]]s — Misra-Gries,
  * CountMin — serialize through Encoders; this one owns its buffer
  * lifecycle and byte format).
  *
  * Semantics: the k best (ord DESC, key ASC) pairs of a group, best
  * first — exactly `row_number() OVER (ORDER BY ord DESC, key ASC) <= k`
  * (q119's oracle states that equality). Null ord/key rows are skipped.
  *
  * Why not a window: per-group top-k via `row_number` shuffles and
  * SORTS every row of every group. This aggregate is a bounded heap:
  * map-side partial aggregation keeps one k-heap per group per task
  * and the shuffle carries at most k pairs per group per mapper —
  * O(n log k) work, O(groups·k) shuffle, no sort of the long tail.
  * At 100 TB (top-3 documents per domain over billions of rows) the
  * window plan's sort is the bottleneck; this is the same
  * sort-to-heap rewrite TakeOrderedAndProject applies to global
  * top-k, applied per group.
  */
object TopK {

  /** Array-heap of the k best (ord, key) pairs; root = WORST kept, so
    * a beaten root is replaced in O(log k). `better` is the total order
    * (ord DESC, key ASC); equal pairs do not displace each other.
    */
  final class TopKHeap(val k: Int) {
    private[TopK] val ords = new Array[Long](k)
    private[TopK] val keys = new Array[Long](k)
    private[TopK] var size = 0

    @inline private def better(oa: Long, ka: Long, ob: Long, kb: Long): Boolean =
      oa > ob || (oa == ob && ka < kb)

    // true when heap slot a holds a WORSE pair than slot b
    @inline private def worse(a: Int, b: Int): Boolean =
      better(ords(b), keys(b), ords(a), keys(a))

    @inline private def swap(a: Int, b: Int): Unit = {
      val o = ords(a); ords(a) = ords(b); ords(b) = o
      val y = keys(a); keys(a) = keys(b); keys(b) = y
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0 && worse(i, (i - 1) / 2)) { swap(i, (i - 1) / 2); i = (i - 1) / 2 }
    }

    private def siftDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = l + 1
        var w = i
        if (l < size && worse(l, w)) w = l
        if (r < size && worse(r, w)) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }

    def add(o: Long, ky: Long): Unit =
      if (size < k) {
        ords(size) = o; keys(size) = ky; size += 1; siftUp(size - 1)
      } else if (k > 0 && better(o, ky, ords(0), keys(0))) {
        ords(0) = o; keys(0) = ky; siftDown()
      }

    def mergeFrom(other: TopKHeap): Unit = {
      var i = 0
      while (i < other.size) { add(other.ords(i), other.keys(i)); i += 1 }
    }

    /** (ord, key) pairs, best first. */
    def sortedBestFirst: Array[(Long, Long)] = {
      val out = Array.tabulate(size)(i => (ords(i), keys(i)))
      out.sortWith { case ((oa, ka), (ob, kb)) => better(oa, ka, ob, kb) }
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * size)
      bb.putInt(size)
      var i = 0
      while (i < size) { bb.putLong(ords(i)); bb.putLong(keys(i)); i += 1 }
      bb.array()
    }
  }

  object TopKHeap {
    def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val h = new TopKHeap(k)
      var i = 0
      while (i < n) { h.add(bb.getLong, bb.getLong); i += 1 }
      h
    }
  }

  final case class TopKPairs(ordExpr: Expression, keyExpr: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

    require(k >= 1, s"k=$k must be >= 1")
    // Inputs must already be LongType — [[topKPairs]] is the only
    // constructor surface and casts are the caller's (AbstractDataType
    // is private[sql], so ImplicitCastInputTypes is out of reach here).
    override def children: Seq[Expression] = Seq(ordExpr, keyExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("ord", LongType, nullable = false),
        StructField("key", LongType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

    override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
      val o = ordExpr.eval(input)
      val ky = keyExpr.eval(input)
      if (o != null && ky != null)
        buffer.add(o.asInstanceOf[Long], ky.asInstanceOf[Long])
      buffer
    }

    override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
      buffer.mergeFrom(other)
      buffer
    }

    override def eval(buffer: TopKHeap): Any =
      new GenericArrayData(buffer.sortedBestFirst.map {
        case (o, ky) => InternalRow(o, ky)
      })

    override def serialize(buffer: TopKHeap): Array[Byte] = buffer.toBytes

    override def deserialize(bytes: Array[Byte]): TopKHeap =
      TopKHeap.fromBytes(k, bytes)

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
      copy(mutableAggBufferOffset = newOffset)

    override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
      copy(inputAggBufferOffset = newOffset)

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(ordExpr = newChildren(0), keyExpr = newChildren(1))

    override def prettyName: String = "topk_pairs"
  }

  /** Aggregate column: array<struct<ord, key>> of the group's k best
    * (ord DESC, key ASC) pairs, best first.
    */
  def topKPairs(ord: Column, key: Column, k: Int): Column =
    CatalystBridge.column(TopKPairs(
      CatalystBridge.expression(ord),
      CatalystBridge.expression(key), k).toAggregateExpression())
}
