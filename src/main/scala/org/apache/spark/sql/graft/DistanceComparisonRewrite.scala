package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule — the `Rule[LogicalPlan]` tier of the extension API:
  * a comparison of [[EuclideanDistance]] against a non-negative literal
  * radius rewrites to the sqrt-free [[SquaredEuclidean]] form,
  *
  * {{{ euclidean_distance(a, b) <= r   ==>   squared_euclidean(a, b) <= r*r }}}
  *
  * sqrt is monotone and both sides are non-negative, so the predicate
  * is equivalent in real arithmetic; in IEEE doubles the boundary can
  * shift by one ulp of the sqrt/square roundings. That makes this a
  * RANGE-SEARCH optimization (thresholds there are heuristic by
  * nature), deliberately NOT installed in the oracle-verified harness
  * sessions, where hash comparisons demand bit-stable boundaries.
  * Opt in per session via `GraftExtensions` (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  *
  * Negative radii are left untouched (the predicate is constant there
  * and squaring would invert it); only DoubleType literals rewrite, so
  * nothing folds out from under a correlated or non-deterministic
  * radius expression. */
object DistanceComparisonRewrite extends Rule[LogicalPlan] {

  private def sq(r: Literal): Literal = {
    val v = r.value.asInstanceOf[Double]
    Literal(v * v, DoubleType)
  }

  private def nonNeg(r: Literal): Boolean = r.value match {
    case v: java.lang.Double => v >= 0.0
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // distance on the left of the comparison
      case LessThan(EuclideanDistance(a, b), r: Literal)
          if r.dataType == DoubleType && nonNeg(r) =>
        LessThan(SquaredEuclidean(a, b), sq(r))
      case LessThanOrEqual(EuclideanDistance(a, b), r: Literal)
          if r.dataType == DoubleType && nonNeg(r) =>
        LessThanOrEqual(SquaredEuclidean(a, b), sq(r))
      case GreaterThan(EuclideanDistance(a, b), r: Literal)
          if r.dataType == DoubleType && nonNeg(r) =>
        GreaterThan(SquaredEuclidean(a, b), sq(r))
      case GreaterThanOrEqual(EuclideanDistance(a, b), r: Literal)
          if r.dataType == DoubleType && nonNeg(r) =>
        GreaterThanOrEqual(SquaredEuclidean(a, b), sq(r))
      // literal on the left
      case LessThan(r: Literal, EuclideanDistance(a, b))
          if r.dataType == DoubleType && nonNeg(r) =>
        LessThan(sq(r), SquaredEuclidean(a, b))
      case LessThanOrEqual(r: Literal, EuclideanDistance(a, b))
          if r.dataType == DoubleType && nonNeg(r) =>
        LessThanOrEqual(sq(r), SquaredEuclidean(a, b))
      case GreaterThan(r: Literal, EuclideanDistance(a, b))
          if r.dataType == DoubleType && nonNeg(r) =>
        GreaterThan(sq(r), SquaredEuclidean(a, b))
      case GreaterThanOrEqual(r: Literal, EuclideanDistance(a, b))
          if r.dataType == DoubleType && nonNeg(r) =>
        GreaterThanOrEqual(sq(r), SquaredEuclidean(a, b))
    }
}
