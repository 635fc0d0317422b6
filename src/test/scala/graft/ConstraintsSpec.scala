package graft

import graft.unified.Constraints
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConstraintsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("unique violations find duplicated keys only") {
    val df = Seq(("a", 1), ("b", 2), ("a", 3)).toDF("k", "v")
    val bad = Constraints.uniqueViolations(df, Seq("k")).collect()
    assert(bad.length == 2 && bad.forall(_.getString(0) == "a"))
    assert(Constraints.uniqueViolations(df, Seq("k", "v")).isEmpty)
  }

  test("exists/type violations over entity props") {
    val ents = Seq(
      ("e1", Map("age" -> "41")),
      ("e2", Map("name" -> "x")),           // missing age
      ("e3", Map("age" -> "forty"))          // untyped age
    ).toDF("key", "props")
    assert(Constraints.existsViolations(ents, "age").collect().map(_.getString(0)).toSeq == Seq("e2"))
    assert(Constraints.typeViolations(ents, "age", "bigint").collect().map(_.getString(0)).toSeq == Seq("e3"))
  }

  test("dangling edges against the node set") {
    val nodes = Seq("a", "b").toDF("key")
    val edges = Seq(("a", "b", "t"), ("a", "ghost", "t")).toDF("src", "dst", "etype")
    val bad = Constraints.danglingEdges(edges, nodes).collect()
    assert(bad.length == 1 && bad.head.getString(1) == "ghost")
    // an edge missing BOTH endpoints is one violation, not two; duplicate
    // input rows still surface individually
    val worse = Seq(("x", "y", "t"), ("a", "ghost", "t"), ("a", "ghost", "t")).toDF("src", "dst", "etype")
    assert(Constraints.danglingEdges(worse, nodes).count() == 3)
  }

  test("base graph holds unique keys and no dangling edges") {
    import graft.graph.TpchGraph
    assert(Constraints.uniqueViolations(TpchGraph.nodes(spark, sf), Seq("key")).isEmpty)
    assert(Constraints.danglingEdges(TpchGraph.edges(spark, sf), TpchGraph.nodes(spark, sf)).isEmpty)
  }
}
