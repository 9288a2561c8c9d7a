package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: a filter `wfa_distance(p, t, band) <= tau` implies the
  * much cheaper `abs(length(p) - length(t)) <= tau` (every indel changes
  * the length by exactly 1, so edit distance >= |len(p) - len(t)| — the
  * same length-difference prefilter the reference applies implicitly via
  * its banded wavefront geometry, /root/reference/src/kernels.cu:243-258).
  * The rule conjoins the implied predicate IN FRONT of the original, so
  * conjunct short-circuiting skips the O(band * len) WFA evaluation for
  * pairs the length gap already rejects — on skewed-length corpora that
  * is most pairs.
  *
  * Soundness around saturation: `wfa_distance` returns `band` when the
  * true distance exceeds the band. For `<= tau` with tau < band (and
  * `< tau` with tau <= band) a saturated result can never satisfy the
  * comparison, so every accepted row carries its true distance and the
  * length bound is implied. For tau at-or-above the band the comparison
  * also accepts saturated pairs with arbitrary length gaps — the rule
  * leaves those filters untouched.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule`; reaches a
  * fixpoint because an already-present implied predicate (semantic
  * equality) is never added twice. */
object WfaLengthPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** The implied cheap predicate, or None when unsound / not applicable.
    * BYTE length (OctetLength), not character length: the scorer aligns
    * UTF8String.getBytes, and for invalid-UTF-8 content (which Spark
    * never validates) a single byte substitution can move the CHARACTER
    * count by up to 3 — `Length`'s gap would not be a lower bound of the
    * byte edit distance and the rule would wrongly drop matches. */
  private def implied(conjunct: Expression): Option[Expression] = conjunct match {
    case LessThanOrEqual(w: WfaDistance, tl @ Literal(tau: Int, _))
        if bandOf(w).exists(tau < _) =>
      Some(LessThanOrEqual(byteLenGap(w), tl))
    case LessThan(w: WfaDistance, tl @ Literal(tau: Int, _))
        if bandOf(w).exists(tau <= _) =>
      Some(LessThan(byteLenGap(w), tl))
    case GreaterThanOrEqual(tl @ Literal(tau: Int, _), w: WfaDistance)
        if bandOf(w).exists(tau < _) =>
      Some(LessThanOrEqual(byteLenGap(w), tl))
    case GreaterThan(tl @ Literal(tau: Int, _), w: WfaDistance)
        if bandOf(w).exists(tau <= _) =>
      Some(LessThan(byteLenGap(w), tl))
    case _ => None
  }

  private def byteLenGap(w: WfaDistance): Expression =
    Abs(Subtract(OctetLength(w.first), OctetLength(w.second)))

  private def bandOf(w: WfaDistance): Option[Int] = w.third match {
    case Literal(b: Int, _) => Some(b)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap(implied)
        .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (additions.isEmpty) f
      else Filter((additions ++ conjuncts).reduceLeft(And), child)
  }
}
