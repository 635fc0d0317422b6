package graft.nql

import graft.Tables
import graft.functions.VectorFunctions._
import graft.graph.{Algorithms, TpchGraph}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AST → DataFrame compiler (the Spark analogue of the reference's
  * `query_router` dispatch, `query_router/src/lib.rs:1969-2091`). Every
  * statement compiles to a declarative plan over the catalog frames —
  * Catalyst owns optimization, so there is no interpreter here at all.
  *
  * Entity routing: keys `vec:{id}` resolve to the embeddings/entity store
  * (graph relation = same-label); all other keys (`nation:0`, …) resolve
  * to the property graph.
  */
final class NqlCompiler(spark: SparkSession, sfDir: String) {

  private def emb: DataFrame = Tables(spark, sfDir, "embeddings")
    .withColumn("key", concat(lit("vec:"), col("vec_id").cast("string")))

  private def embOf(key: String): DataFrame =
    emb.filter(col("key") === key).select(col("embedding").as("qv"))

  private def labelOf(key: String): DataFrame =
    emb.filter(col("key") === key).select(col("label").as("elabel"))

  /** Register the relational tables as temp views for SQL passthrough. */
  def registerViews(): Unit =
    Tables.names.foreach(n => Tables(spark, sfDir, n).createOrReplaceTempView(n))

  def compile(st: Statement): DataFrame = st match {
    case SqlPassthrough(sql) =>
      registerViews()
      spark.sql(sql)

    case Similar(key, metric, limit, None, where) =>
      val scoreCol = metric match {
        case Metric.Cosine => cosine_similarity(col("embedding"), col("qv"))
        case Metric.Euclidean => l2_distance(col("embedding"), col("qv"))
        case Metric.Dot => dot_product(col("embedding"), col("qv"))
      }
      val base = where.foldLeft(emb.filter(col("key") =!= key))((df, c) => df.filter(cond(c)))
        .crossJoin(broadcast(embOf(key)))
        .select(col("key"), round(scoreCol, 4).as("score"))
      val ordered = metric match {
        case Metric.Euclidean => base.orderBy(asc("score"), col("key"))
        case _ => base.orderBy(desc("score"), col("key"))
      }
      ordered.limit(limit)

    case s @ Similar(key, _, limit, Some(e), where) =>
      // top-2k similar ∩ neighbors(e), top-k — tensor_unified/src/lib.rs:884-938
      val top2k = compile(s.copy(connectedTo = None, limit = 2 * limit))
      val nb = emb.crossJoin(broadcast(labelOf(e)))
        .filter(col("label") === col("elabel") && col("key") =!= e)
        .select("key")
      top2k.join(nb, Seq("key")).orderBy(desc("score"), col("key")).limit(limit)

    case Neighbors(key, Some(simTo), _, limit) =>
      val nb = emb.crossJoin(broadcast(labelOf(key)))
        .filter(col("label") === col("elabel") && col("key") =!= key)
      nb.crossJoin(broadcast(embOf(simTo)))
        .select(col("key"), round(cosine_similarity(col("embedding"), col("qv")), 4).as("score"))
        .orderBy(desc("score"), col("key"))
        .limit(limit.getOrElse(10))

    case Neighbors(key, None, etype, limit) =>
      val e = TpchGraph.undirected(TpchGraph.edges(spark, sfDir))
        .filter(col("src") === key)
      val filtered = etype.fold(e)(t => e.filter(col("etype") === t))
      val out = filtered.select(col("dst").as("neighbor"), col("etype")).orderBy("neighbor")
      limit.fold(out)(out.limit)

    case PathShortest(from, to, maxDepth) =>
      Algorithms.bfs(TpchGraph.undirected(TpchGraph.edges(spark, sfDir)), from, maxDepth)
        .filter(col("key") === to)
        .select(lit(from).as("from"), col("key").as("to"), col("depth"))

    case PathWeighted(from, to, maxHops) =>
      val w = TpchGraph.undirected(TpchGraph.edges(spark, sfDir))
        .withColumn("w", expr(
          "CASE etype WHEN 'in_region' THEN 2.0 WHEN 'in_nation' THEN 1.0 ELSE 1.5 END"))
      Algorithms.sssp(w, from, maxHops)
        .filter(col("key") === to)
        .select(lit(from).as("from"), col("key").as("to"), round(col("cost"), 4).as("cost"))

    case NodeGet(key) =>
      TpchGraph.nodes(spark, sfDir).filter(col("key") === key)

    case NodeList(label, limit) =>
      val n = TpchGraph.nodes(spark, sfDir)
      val f = label.fold(n)(l => n.filter(col("label") === l)).orderBy("key")
      limit.fold(f)(f.limit)

    case EdgeList(etype, limit) =>
      val e = TpchGraph.edges(spark, sfDir)
      val f = etype.fold(e)(t => e.filter(col("etype") === t)).orderBy("src", "dst")
      limit.fold(f)(f.limit)

    case Degree(key) =>
      TpchGraph.undirected(TpchGraph.edges(spark, sfDir))
        .filter(col("src") === key)
        .groupBy(col("src").as("key")).agg(count(lit(1)).as("degree"))

    case GraphPageRank(iters) =>
      Algorithms.pageRank(TpchGraph.treeEdges(spark, sfDir), TpchGraph.nodes(spark, sfDir), iters)
        .select(col("key"), round(col("pr"), 6).as("pr"))
        .orderBy(desc("pr"), col("key"))

    case GraphComponents =>
      Algorithms.connectedComponents(
        TpchGraph.undirected(TpchGraph.edges(spark, sfDir)), TpchGraph.nodes(spark, sfDir), 6)
        .groupBy("component").agg(count(lit(1)).as("n_nodes"))
        .orderBy("component")

    case GraphTriangles =>
      val e = TpchGraph.sameRegionEdges(spark, sfDir).select("src", "dst")
      e.select(col("src").as("a"), col("dst").as("b"))
        .join(e.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
        .join(e.select(col("src").as("a"), col("dst").as("c")), Seq("a", "c"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("key"))
        .groupBy("key").agg(count(lit(1)).as("n_triangles"))
        .orderBy("key")

    case EmbedGet(key) =>
      emb.filter(col("key") === key).select("key", "embedding")

    case EntityGet(key) =>
      emb.filter(col("key") === key).select("key", "label", "embedding")

    case Find(target, where, limit) =>
      val base = Tables(spark, sfDir, target)
      val f = where.foldLeft(base)((df, c) => df.filter(cond(c)))
      val ordered = f.orderBy(f.columns.head)
      limit.fold(ordered)(ordered.limit)
  }

  private def cond(c: Cond): Column = {
    val l = col(c.column); val v = lit(c.value)
    c.op match {
      case "=" => l === v
      case "!=" => l =!= v
      case "<" => l < v
      case "<=" => l <= v
      case ">" => l > v
      case ">=" => l >= v
    }
  }
}

/** Front door: `Nql.execute(spark, sfDir, "SIMILAR 'vec:0' LIMIT 5")`. */
object Nql {
  def parse(query: String): Statement = NqlParser.parse(query)
  def execute(spark: SparkSession, sfDir: String, query: String): DataFrame =
    new NqlCompiler(spark, sfDir).compile(parse(query))
}
