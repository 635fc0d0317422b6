package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per implemented operator
  * from SURVEY.md §2); `oracleSql` holds the DuckDB-equivalent SQL for every
  * query whose semantics are ANSI-expressible. Both maps are assembled from
  * the per-domain modules.
  */
object SparkEntry {

  /** All declared operator queries, in build order. */
  def allDefs: Seq[(String, QDef)] =
    graft.relational.RelationalQueries.defs ++
      graft.vector.VectorQueries.defs ++
      graft.pipeline.PipelineQueries.defs ++
      graft.graph.GraphQueries.defs ++
      graft.unified.UnifiedQueries.defs ++
      graft.nql.NqlQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables(spark, d, "lineitem")
      .join(broadcast(Tables(spark, d, "orders")), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, QDef(_, Some(sql))) => n -> sql }.toMap
}
