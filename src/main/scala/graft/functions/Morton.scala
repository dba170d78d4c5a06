package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

import graft.CatalystBridge

/** Morton (Z-order) interleave as a NATIVE Catalyst expression — the
  * hand-written-`doGenCode` tier of the extension ladder (composition →
  * StaticInvoke static → native Expression): the generated code inlines
  * the five-step magic-mask bit spread directly into whole-stage codegen,
  * replacing `operators/Layout`'s 16-term shift/mask sum (16 ANDs + 16
  * shifts + 16 multiplies + 15 adds per input) with 12 shift/mask ops per
  * input — the difference matters when a 100 TB layout job computes z for
  * every row it writes.
  *
  * Same value contract as `Layout.zValueSql` (bit i of x → z bit 2i, bit
  * i of y → z bit 2i+1), pinned equal by `PipelineOpsSpec`.
  */
object Morton {

  /** Spread the low 32 bits of v to the even bit positions of a long. */
  private def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interpreted-path / test kernel; bits confines each input. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    spread(x & mask) | (spread(y & mask) << 1)
  }

  /** `morton_code(x, y)` as a Column. */
  def code(x: Column, y: Column, bits: Int = 16): Column =
    CatalystBridge.column(MortonCode(
      CatalystBridge.expression(x), CatalystBridge.expression(y), bits))

  /** K-dimensional interleave kernel (interpreted path / tests): bit i
    * of input j lands at z bit `i*k + j`. The 2-dim magic-mask kernel
    * above stays the hot path; this generic form serves 3+ clustering
    * columns, where `bits*k <= 63` bounds the per-dimension width.
    */
  def interleaveN(xs: Array[Long], bits: Int): Long = {
    val k = xs.length
    var z = 0L
    var i = 0
    while (i < bits) {
      var j = 0
      while (j < k) {
        z |= ((xs(j) >>> i) & 1L) << (i * k + j)
        j += 1
      }
      i += 1
    }
    z
  }

  /** `morton_code_n(x1, ..., xk)` as a Column — k >= 2 dimensions. */
  def codeN(cols: Seq[Column], bits: Int): Column =
    if (cols.length == 2) code(cols(0), cols(1), bits)
    else CatalystBridge.column(
      MortonNCode(cols.map(CatalystBridge.expression), bits))
}

/** K-dimensional Morton interleave (k >= 3; the 2-dim case stays on
  * [[MortonCode]]'s magic masks). Codegen unrolls the `bits × k`
  * shift/mask/or lattice — a layout-only key computed once per row by
  * a compaction job, so the unrolled form (no loop, no array) keeps it
  * inside whole-stage codegen like its 2-dim sibling.
  */
case class MortonNCode(children: Seq[Expression], bits: Int)
    extends Expression {
  require(children.length >= 3,
    s"morton_code_n needs >= 3 dimensions (use morton_code for 2), " +
      s"got ${children.length}")
  require(bits >= 1 && bits * children.length <= 63,
    s"bits * dims must fit a positive long: bits=$bits, " +
      s"dims=${children.length}")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires all-BIGINT inputs, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "morton_code_n"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow)
      : Any = {
    val vals = new Array[Long](children.length)
    var j = 0
    val mask = (1L << bits) - 1
    while (j < children.length) {
      val v = children(j).eval(input)
      if (v == null) return null
      vals(j) = v.asInstanceOf[Long] & mask
      j += 1
    }
    Morton.interleaveN(vals, bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val mask = (1L << bits) - 1
    val k = children.length
    val z = ctx.freshName("mnz")
    val vs = children.indices.map(j => ctx.freshName(s"mn$j"))
    val decls = children.indices.map(j =>
      s"long ${vs(j)} = ${evals(j).value} & ${mask}L;").mkString("\n")
    // the bits×k shift/mask/or lattice, fully unrolled — branch-free,
    // whole-stage-codegen friendly
    val terms = (0 until bits).flatMap(i => (0 until k).map(j =>
      s"$z |= ((${vs(j)} >>> $i) & 1L) << ${i * k + j};")).mkString("\n")
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val childEval = evals.map(_.code).reduce(_ + _)
    ev.copy(code = childEval +
      code"""
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = -1L;
        if (!${ev.isNull}) {
          $decls
          long $z = 0L;
          $terms
          ${ev.value} = $z;
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MortonNCode =
    copy(children = newChildren)
}

case class MortonCode(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  // AbstractDataType (and with it ExpectsInputTypes' signature) is
  // private[sql] in Spark 4, so the type contract is enforced here;
  // the SQL builder (GraftExtensions) inserts explicit casts instead
  // of relying on implicit coercion.
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_code"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Morton.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val mask = (1L << bits) - 1
      def spreadCode(v: String): String =
        s"""$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x3333333333333333L;
           |$v = ($v | ($v << 1)) & 0x5555555555555555L;""".stripMargin
      val gx = ctx.freshName("gx")
      val gy = ctx.freshName("gy")
      s"""long $gx = $x & ${mask}L;
         |long $gy = $y & ${mask}L;
         |${spreadCode(gx)}
         |${spreadCode(gy)}
         |${ev.value} = $gx | ($gy << 1);""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MortonCode =
    copy(left = newLeft, right = newRight)
}
