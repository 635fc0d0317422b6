package graft.unified

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Constraint checking as validation jobs (reference enforces
  * unique/exists/type property constraints inline on write —
  * `graph_engine/src/lib.rs:7613-7700`; a lakehouse enforces them the way
  * warehouses do: as declarative scans that return the violating rows, run
  * before publish or as a scheduled audit — each check is one shuffle or
  * a map-side filter, so they hold at any scale).
  *
  * Each method returns the VIOLATIONS (empty frame = constraint holds).
  */
object Constraints {

  /** Rows whose `cols` tuple occurs more than once. */
  def uniqueViolations(df: DataFrame, cols: Seq[String]): DataFrame = {
    val dupKeys = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") > 1)
    df.join(dupKeys, cols)
  }

  /** Entity-store rows missing a required property. */
  def existsViolations(entities: DataFrame, prop: String): DataFrame =
    entities.filter(element_at(col("props"), prop).isNull)

  /** Entity-store rows whose property value doesn't parse as `dataType`
    * (e.g. "bigint", "double", "date") — present-but-untyped values only;
    * pair with [[existsViolations]] for required typed props. */
  def typeViolations(entities: DataFrame, prop: String, dataType: String): DataFrame =
    entities
      .withColumn("v", element_at(col("props"), prop))
      // try_cast, not cast: under ANSI mode a malformed value must mark a
      // violation, not fail the audit job
      .filter(col("v").isNotNull && expr(s"try_cast(v AS $dataType)").isNull)
      .drop("v")

  /** Edges whose endpoints are not present in `nodes(key)` — referential
    * integrity for the graph overlay. */
  def danglingEdges(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val keys = nodes.select(col("key"))
    val outCols = edges.columns.map(col).toSeq
    // anti-joins reorder columns (join key first) — re-project both arms
    // to the input order before the union
    // second arm keeps only src-present rows so an edge missing BOTH
    // endpoints reports once, while duplicate input rows still surface
    edges.join(keys.withColumnRenamed("key", "src"), Seq("src"), "left_anti").select(outCols: _*)
      .union(edges.join(keys.withColumnRenamed("key", "dst"), Seq("dst"), "left_anti")
        .join(keys.withColumnRenamed("key", "src"), Seq("src"), "left_semi")
        .select(outCols: _*))
  }
}
