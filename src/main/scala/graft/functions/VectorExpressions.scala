package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector similarity over
  * `ARRAY<FLOAT>` columns, with whole-stage codegen (`doGenCode`) so the
  * hot loop of a brute-force kNN scan stays inside Tungsten.
  *
  * Semantics mirror the reference's distance kernels (cosine / dot /
  * euclidean over f32 embeddings — reference `tensor_store/src/distance.rs`,
  * `vector_engine/src/lib.rs:2278`) but accumulate in double, sequentially,
  * to line up with double-precision SQL oracles.
  *
  * Dimension mismatch is an error in both eval paths (the reference's
  * DimensionMismatch — mixed-dimension or corrupt embeddings must not
  * yield plausible-looking prefix scores). The zero-norm → 0.0 cosine
  * convention is a separate, documented case.
  */
object VectorBinaryExpression {
  def dimCheck(name: String, a: ArrayData, b: ArrayData): Unit =
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"$name: embedding dimension mismatch (${a.numElements()} vs ${b.numElements()})")

  /** Generated-Java equivalent of [[dimCheck]]. */
  def dimCheckCode(name: String, a: String, b: String): String =
    s"""if ($a.numElements() != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$name: embedding dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
       |}""".stripMargin
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Combine per-element accumulators: dot = Σxy, na = Σx², nb = Σy². */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  protected def finishCode(dot: String, na: String, nb: String): String

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VectorBinaryExpression.dimCheck(prettyName, a, b)
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    finish(dot, na, nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |${VectorBinaryExpression.dimCheckCode(prettyName, a, b)}
         |int $n = $a.numElements();
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ${finishCode(dot, na, nb)};
       """.stripMargin
    })
}

/** cosine_similarity(a, b) = Σxy / (‖a‖·‖b‖); 0.0 when either norm is 0. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  override protected def finishCode(dot: String, na: String, nb: String): String =
    s"(($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** dot_product(a, b) = Σ aᵢ·bᵢ */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"
  override protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  override protected def finishCode(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2_distance(a, b) = sqrt(Σ (aᵢ-bᵢ)²) — own loop (different accumulator). */
case class L2Distance(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "l2_distance"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VectorBinaryExpression.dimCheck(prettyName, a, b)
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |${VectorBinaryExpression.dimCheckCode(prettyName, a, b)}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** l2_distance_squared(a, b) = Σ (aᵢ-bᵢ)² — sqrt-free radius-search form;
  * the optimizer rewrites `l2_distance(a,b) ⋈ r` into this
  * (graft.plans.RewriteL2Comparison).
  */
case class L2DistanceSquared(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "l2_distance_squared"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    VectorBinaryExpression.dimCheck(prettyName, a, b)
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |${VectorBinaryExpression.dimCheckCode(prettyName, a, b)}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Column-API + SQL-registration front door for the vector expressions. */
object VectorFunctions {
  private def c(e: Expression): Column = Bridge.column(e)
  private def e(col: Column): Expression = Bridge.expression(col)

  def cosine_similarity(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def dot_product(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def l2_distance(a: Column, b: Column): Column = c(L2Distance(e(a), e(b)))

  /** Register `cosine_similarity`/`dot_product`/`l2_distance` for spark.sql. */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_distance", es => L2Distance(es(0), es(1)), "built-in")
  }
}
