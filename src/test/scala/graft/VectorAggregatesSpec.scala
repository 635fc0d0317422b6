package graft

import graft.functions.VectorAggregates
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorAggregatesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("centroid aggregator equals the posexplode+avg form on real embeddings") {
    val e = Tables(spark, sf, "embeddings")
    val viaAgg = e.groupBy("label")
      .agg(VectorAggregates.centroid(col("embedding")).as("c"))
      .collect().map(r => r.get(0).toString -> r.getSeq[Float](1).toSeq).toMap
    val viaExplode = e.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("label", "i").agg(avg("x").as("cx"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(i, cx))), p -> CAST(p.cx AS FLOAT))").as("c"))
      .collect().map(r => r.get(0).toString -> r.getSeq[Float](1).toSeq).toMap
    assert(viaAgg.keySet == viaExplode.keySet)
    for (k <- viaAgg.keySet; (a, b) <- viaAgg(k).zip(viaExplode(k)))
      assert(math.abs(a - b) < 1e-4f, s"label $k: $a vs $b")
  }

  test("handles nulls, empty groups, and rejects mixed dimensions") {
    val df = Seq(
      ("a", Array(1.0f, 3.0f)), ("a", null.asInstanceOf[Array[Float]]),
      ("a", Array(3.0f, 5.0f)), ("b", Array(2.0f, 2.0f))
    ).toDF("g", "v")
    val out = df.groupBy("g").agg(VectorAggregates.centroid(col("v")).as("c"))
      .collect().map(r => r.get(0).toString -> r.getSeq[Float](1).toSeq).toMap
    assert(out("a") == Seq(2.0f, 4.0f) && out("b") == Seq(2.0f, 2.0f))
    val mixed = Seq(("a", Array(1.0f)), ("a", Array(1.0f, 2.0f))).toDF("g", "v")
    assertThrows[Exception](
      mixed.groupBy("g").agg(VectorAggregates.centroid(col("v"))).collect())
  }
}
