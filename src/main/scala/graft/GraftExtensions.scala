package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, IntegerLiteral}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

import graft.functions.{ArrayOps, MortonCode, SimHash}

/** SQL front-end registration for the engine's custom kernels — the
  * `SparkSessionExtensions` tier of the extension ladder: a user enables
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) and the native
  * expressions become first-class SQL functions, usable from `spark.sql`
  * text exactly like built-ins (codegen'd, null-safe, analyzer-checked):
  *
  *   - `morton_code(x, y[, bits])` — native Z-order interleave
  *     (`functions/Morton`, hand-written doGenCode)
  *   - `simhash64(tokens)` — 64-bit SimHash over an array<string>
  *     (`functions/SimHash` static)
  *   - `jaccard_sorted(a, b)` — Jaccard over sorted long arrays
  *     (`functions/ArrayOps` static)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  // SQL-side integer literals arrive as INT; MortonCode demands BIGINT
  // (no implicit coercion — ExpectsInputTypes is private[sql] in Spark 4),
  // so the builder casts explicitly, like a FunctionRegistry entry would.
  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private val mortonBuilder: FunctionBuilder = {
    case Seq(x, y) => MortonCode(asLong(x), asLong(y), 16)
    case Seq(x, y, IntegerLiteral(b)) => MortonCode(asLong(x), asLong(y), b)
    case args => throw new IllegalArgumentException(
      s"morton_code expects (x, y[, bits literal]), got ${args.length} args")
  }

  private val simhashBuilder: FunctionBuilder = {
    case Seq(tokens) =>
      StaticInvoke(SimHash.getClass, LongType, "simhash64", Seq(tokens),
        Seq(ArrayType(StringType)), returnNullable = false)
    case args => throw new IllegalArgumentException(
      s"simhash64 expects (tokens), got ${args.length} args")
  }

  private val jaccardBuilder: FunctionBuilder = {
    case Seq(a, b) =>
      StaticInvoke(ArrayOps.getClass, DoubleType, "jaccardSortedLongs",
        Seq(a, b), Seq(ArrayType(LongType), ArrayType(LongType)),
        returnNullable = false)
    case args => throw new IllegalArgumentException(
      s"jaccard_sorted expects (a, b), got ${args.length} args")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Rule[LogicalPlan] tier: bounded levenshtein predicates get an O(1)
    // length-difference prefilter conjunct (graft.plans.LevenshteinPrefilter)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
    // whole-operator tier: native AS-OF join (custom LogicalPlan +
    // SparkStrategy + SparkPlan — graft.plans.AsOfJoinPlan)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((FunctionIdentifier("morton_code"),
      info("morton_code",
        "morton_code(x, y[, bits]) - Z-order bit interleave of two longs"),
      mortonBuilder))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64",
        "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      simhashBuilder))
    ext.injectFunction((FunctionIdentifier("jaccard_sorted"),
      info("jaccard_sorted",
        "jaccard_sorted(a, b) - Jaccard of two sorted, distinct long arrays"),
      jaccardBuilder))
  }
}
