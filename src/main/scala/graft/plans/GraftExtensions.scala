package graft.plans

import graft.functions.{CosineSimilarity, DotProduct, L2Distance, L2DistanceSquared}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: comparisons against an l2 distance don't need
  * the per-row sqrt — `l2_distance(a,b) ⋈ r` (r ≥ 0 literal) rewrites to
  * `l2_distance_squared(a,b) ⋈ r²`. On a radius-search scan this removes
  * one transcendental call per row from the hot loop.
  */
object RewriteL2Comparison extends Rule[LogicalPlan] {
  private def sq(r: Literal): Literal = {
    val v = r.value.asInstanceOf[Double]
    Literal(v * v)
  }
  private def nonNegative(l: Literal): Boolean =
    l.value != null && l.value.asInstanceOf[Double] >= 0.0

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThan(L2Distance(a, b), r @ Literal(_, org.apache.spark.sql.types.DoubleType)) if nonNegative(r) =>
      LessThan(L2DistanceSquared(a, b), sq(r))
    case LessThanOrEqual(L2Distance(a, b), r @ Literal(_, org.apache.spark.sql.types.DoubleType)) if nonNegative(r) =>
      LessThanOrEqual(L2DistanceSquared(a, b), sq(r))
    case GreaterThan(L2Distance(a, b), r @ Literal(_, org.apache.spark.sql.types.DoubleType)) if nonNegative(r) =>
      GreaterThan(L2DistanceSquared(a, b), sq(r))
    case GreaterThanOrEqual(L2Distance(a, b), r @ Literal(_, org.apache.spark.sql.types.DoubleType)) if nonNegative(r) =>
      GreaterThanOrEqual(L2DistanceSquared(a, b), sq(r))
  }
}

/** Session extensions: inject the vector functions into every session's
  * function registry and register the l2 rewrite with the optimizer.
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)…
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteL2Comparison)
    Seq[(String, Seq[Expression] => Expression)](
      "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
      "dot_product" -> (es => DotProduct(es(0), es(1))),
      "l2_distance" -> (es => L2Distance(es(0), es(1))),
      "l2_distance_squared" -> (es => L2DistanceSquared(es(0), es(1)))
    ).foreach { case (name, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
  }
}
