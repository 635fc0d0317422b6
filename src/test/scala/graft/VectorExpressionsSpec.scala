package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Correctness of the native vector expressions: whole-stage-codegen
  * (`doGenCode`) vs interpreted (`nullSafeEval`) paths must agree
  * bit-for-bit, across random vectors and edge shapes.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // Pairs share a length: mismatched dimensions are an error by design
  // (tested separately), not a shape the kernels score.
  private val vecPairGen: Gen[(Array[Float], Array[Float])] =
    Gen.choose(1, 32).flatMap { n =>
      val v = Gen.listOfN(n, Gen.choose(-10f, 10f)).map(_.toArray)
      v.flatMap(a => v.map(b => (a, b)))
    }

  private def runBothPaths(a: Array[Float], b: Array[Float]): (Seq[Double], Seq[Double]) = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b")).as("cos"),
        dot_product(col("a"), col("b")).as("dot"),
        l2_distance(col("a"), col("b")).as("l2"))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val gen = df.collect()(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = try df.collect()(0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    ((0 to 2).map(gen.getDouble), (0 to 2).map(interp.getDouble))
  }

  test("codegen and interpreted evaluation agree on random vectors") {
    (1 to 20).foreach { k =>
      val seed = Seed(k.toLong)
      val (a, b) = vecPairGen.apply(Gen.Parameters.default, seed).get
      val (g, i) = runBothPaths(a, b)
      assert(g == i, s"codegen $g != interpreted $i for ${a.toSeq}/${b.toSeq}")
    }
  }

  test("known values and edge shapes") {
    val (g, _) = runBothPaths(Array(1f, 0f), Array(1f, 0f))
    assert(g(0) == 1.0 && g(1) == 1.0 && g(2) == 0.0)
    // zero vector → cosine 0.0 by convention (reference semantics), not NaN
    val (z, _) = runBothPaths(Array(0f, 0f), Array(1f, 2f))
    assert(z(0) == 0.0)
    // dimension mismatch → error on BOTH paths (reference DimensionMismatch
    // semantics — corrupt/mixed-dimension embeddings must not score)
    Seq("true", "false").foreach { cg =>
      spark.conf.set("spark.sql.codegen.wholeStage", cg)
      val df = Seq((Array(1f, 1f, 1f), Array(1f, 1f))).toDF("a", "b")
        .select(dot_product(col("a"), col("b")).as("d"))
      val ex = intercept[Exception](df.collect())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("dimension mismatch")), s"cg=$cg: $ex")
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // nulls propagate
    val df = Seq((Some(Array(1f)), Option.empty[Array[Float]])).toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b")).as("c"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("SQL registration exposes the functions to spark.sql") {
    registerAll(spark)
    val r = spark.sql("SELECT cosine_similarity(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS c").collect()(0)
    assert(r.getDouble(0) == 0.0)
  }
}
