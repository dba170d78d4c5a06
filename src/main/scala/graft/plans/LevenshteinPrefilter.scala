package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: bounded-edit-distance predicates get an O(1) length
  * prefilter.
  *
  * `levenshtein(a, b) <= k` costs O(|a|·|b|) per pair — in a fuzzy join
  * (q83 shape) that DP dominates. Every edit changes a string's length by
  * at most 1, so `lev(a,b) <= k` implies `abs(length(a)-length(b)) <= k`;
  * prepending that guard as a conjunct short-circuits the DP on most
  * non-matching pairs while provably never changing results (the guard is
  * IMPLIED by the predicate, including under NOT/OR in three-valued
  * logic: predicate TRUE ⇒ guard TRUE; guard FALSE ⇒ both lengths
  * non-null ⇒ predicate non-null FALSE; operands null ⇒ both null).
  *
  * This is the `Rule[LogicalPlan]` tier of the extension ladder
  * (native `Expression` = functions/Morton; SQL function registration =
  * GraftExtensions; this rule is injected there via
  * `injectOptimizerRule`). Idempotent under the optimizer's fixed-point
  * batches: a filter whose conjuncts already contain the guard is left
  * alone.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** (a, b, k) for the shapes the guard is implied by: lev ≤ k, lev < k,
    * lev = k, and their mirrored literal-first forms. Only the 2-arg
    * levenshtein qualifies — the 3-arg threshold form returns -1 past its
    * threshold, which a `<= k` bound would misread.
    */
  private def bounded(e: Expression)
      : Option[(Expression, Expression, Literal)] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), k: Literal) => Some((a, b, k))
    case LessThan(Levenshtein(a, b, None), k: Literal)        => Some((a, b, k))
    case EqualTo(Levenshtein(a, b, None), k: Literal)         => Some((a, b, k))
    case GreaterThanOrEqual(k: Literal, Levenshtein(a, b, None)) =>
      Some((a, b, k))
    case GreaterThan(k: Literal, Levenshtein(a, b, None)) => Some((a, b, k))
    case EqualTo(k: Literal, Levenshtein(a, b, None))     => Some((a, b, k))
    case _ => None
  }

  private def guard(a: Expression, b: Expression, k: Literal): Expression = {
    val diff = Abs(Subtract(Length(a), Length(b)))
    val lhs = if (k.dataType == LongType) Cast(diff, LongType) else diff
    LessThanOrEqual(lhs, k)
  }

  /** Top-level conjuncts only: sound in any position, but guarding under
    * OR/NOT would defeat the fixed-point idempotence check (the added
    * conjunct must be visible to splitConjunctivePredicates next pass).
    * Catalyst's own predicate pushdown keeps real predicates conjunctive,
    * so this covers the fuzzy-join shape.
    */
  private def guarded(cond: Expression): Option[Expression] = {
    val parts = splitConjunctivePredicates(cond)
    val out = parts.foldLeft(Vector.empty[Expression]) { (acc, p) =>
      bounded(p) match {
        case Some((a, b, k))
            if (k.dataType == IntegerType || k.dataType == LongType) &&
              !(parts ++ acc).exists(_.semanticEquals(guard(a, b, k))) =>
          acc :+ guard(a, b, k) :+ p
        case _ => acc :+ p
      }
    }
    if (out.length == parts.length) None else Some(out.reduceLeft(And))
  }

  /** Both predicate homes: Filter conditions AND join conditions — in a
    * blocked fuzzy join, predicate pushdown moves the edit-distance bound
    * into the Join node, where the guard saves the most (it runs before
    * the DP on every candidate pair the equi-join emits).
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      guarded(cond).map(c => f.copy(condition = c)).getOrElse(f)
    case j @ org.apache.spark.sql.catalyst.plans.logical.Join(
        _, _, _, Some(cond), _) =>
      guarded(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
