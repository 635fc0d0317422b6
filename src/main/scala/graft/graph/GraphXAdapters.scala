package graft.graph

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bridge from the string-keyed property-graph DataFrames to GraphX, plus
  * adapters for the GraphX built-ins (PageRank, connected components,
  * triangle counting). The DataFrame implementations in [[Algorithms]]
  * stay the oracle-checked path — GraphX is the battle-tested alternative
  * for iteration-heavy workloads (Pregel scheduling, edge partitioning),
  * and GraphXAdaptersSpec cross-validates the two.
  */
object GraphXAdapters {

  /** Deterministic key→id assignment (sorted keys, dense longs). */
  private def idMap(nodes: DataFrame): RDD[(String, VertexId)] =
    nodes.select("key").distinct().orderBy("key")
      .rdd.map(_.getString(0)).zipWithIndex()

  def toGraphX(nodes: DataFrame, edges: DataFrame): Graph[String, Double] = {
    val ids = idMap(nodes).cache()
    val vertices: RDD[(VertexId, String)] = ids.map { case (k, i) => (i, k) }
    val edgeRdd: RDD[Edge[Double]] = edges.select("src", "dst")
      .rdd.map(r => (r.getString(0), r.getString(1)))
      .join(ids).map { case (_, (dst, srcId)) => (dst, srcId) }
      .join(ids).map { case (_, (srcId, dstId)) => Edge(srcId, dstId, 1.0) }
    Graph(vertices, edgeRdd)
  }

  private def withKeys(spark: SparkSession, rdd: RDD[(VertexId, String, Double)]): DataFrame = {
    import spark.implicits._
    rdd.map { case (_, k, v) => (k, v) }.toDF("key", "value")
  }

  /** Static PageRank (fixed iterations) via GraphX → (key, pr). */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val g = toGraphX(nodes, edges)
    val ranked = g.staticPageRank(iters).vertices
    val joined = g.vertices.join(ranked).map { case (id, (k, pr)) => (id, k, pr) }
    withKeys(nodes.sparkSession, joined).withColumnRenamed("value", "pr")
  }

  /** Connected components via GraphX → (key, component-key). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    import nodes.sparkSession.implicits._
    val g = toGraphX(nodes, edges)
    val cc = g.connectedComponents().vertices // (id, minComponentId)
    val byId = g.vertices // (id, key)
    // cc gives component = min vertex id; translate both the node and its
    // component representative back to string keys
    val out = cc.join(byId).map { case (_, (compId, key)) => (compId, key) }
      .join(byId)
      .map { case (_, (key, compKeyStr)) => (key, compKeyStr) }
    out.toDF("key", "component")
  }

  /** Strongly connected components via GraphX's Pregel implementation →
    * (key, scc-key). Cross-validates the closure-squaring min-label form
    * in [[Algorithms.stronglyConnectedComponents]], which that method
    * notes is exact only when distinct SCCs have distinct reachability
    * signatures — GraphX's peeling algorithm has no such caveat.
    */
  def stronglyConnectedComponents(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    import nodes.sparkSession.implicits._
    val g = toGraphX(nodes, edges)
    val scc = g.stronglyConnectedComponents(iters).vertices // (id, minSccId)
    val byId = g.vertices
    scc.join(byId).map { case (_, (sccId, key)) => (sccId, key) }
      .join(byId)
      .map { case (_, (key, sccKeyStr)) => (key, sccKeyStr) }
      .toDF("key", "scc")
  }

  /** Label propagation via GraphX's Pregel implementation →
    * (key, community-key). Cross-validates the windowed-argmax loop in
    * [[Algorithms.labelPropagation]] with an independent implementation
    * (different tie-break rule, same converged partition on fixtures
    * where the majority vote is unambiguous). */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    import nodes.sparkSession.implicits._
    val g = toGraphX(nodes, edges)
    val lp = org.apache.spark.graphx.lib.LabelPropagation.run(g, iters).vertices
    val byId = g.vertices
    lp.join(byId).map { case (_, (commId, key)) => (commId, key) }
      .join(byId)
      .map { case (_, (key, commKey)) => (key, commKey) }
      .toDF("key", "community")
  }

  /** Triangle counts via GraphX → (key, n_triangles). */
  def triangleCount(nodes: DataFrame, edges: DataFrame): DataFrame = {
    import nodes.sparkSession.implicits._
    val g = toGraphX(nodes, edges).partitionBy(org.apache.spark.graphx.PartitionStrategy.RandomVertexCut)
    val tc = g.triangleCount().vertices
    g.vertices.join(tc).map { case (_, (k, n)) => (k, n.toLong) }.toDF("key", "n_triangles")
  }
}
