package graft

import graft.functions.{L2Distance, L2DistanceSquared}
import graft.plans.RewriteL2Comparison
import org.apache.spark.sql.catalyst.dsl.plans._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the l2 comparison rewrite rule (the end-to-end drive
  * lives in graft.plans.ExtensionsDemo — extensions bind at session
  * construction, so the shared test session can't host it).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private val a = AttributeReference("a", ArrayType(FloatType))()
  private val b = AttributeReference("b", ArrayType(FloatType))()
  private val rel = LocalRelation(a, b)

  test("l2_distance <= r rewrites to squared form with r^2") {
    val plan = rel.where(LessThanOrEqual(L2Distance(a, b), Literal(2.0))).analyze
    val out = RewriteL2Comparison(plan)
    val found = out.expressions.flatMap(_.collect {
      case LessThanOrEqual(L2DistanceSquared(_, _), Literal(v, DoubleType)) => v
    })
    assert(found == Seq(4.0), s"rule did not rewrite: $out")
  }

  test("negative radius is left untouched (sqrt >= 0 semantics differ)") {
    val plan = rel.where(GreaterThan(L2Distance(a, b), Literal(-1.0))).analyze
    val out = RewriteL2Comparison(plan)
    val untouched = out.expressions.flatMap(_.collect {
      case GreaterThan(L2Distance(_, _), _) => true
    })
    assert(untouched.nonEmpty, "negative-radius comparison must not be rewritten")
  }

  test("non-literal radius is left untouched") {
    val r = AttributeReference("r", DoubleType)()
    val rel2 = LocalRelation(a, b, r)
    val plan = rel2.where(LessThan(L2Distance(a, b), r)).analyze
    val out = RewriteL2Comparison(plan)
    val untouched = out.expressions.flatMap(_.collect {
      case LessThan(L2Distance(_, _), _) => true
    })
    assert(untouched.nonEmpty)
  }
}
