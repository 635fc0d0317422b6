package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * Every query takes the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (correctness) and sf0.1+ (bench).
  * Reads go straight to `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom — no caching or materialization here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
      // ([PARQUET_TYPE_ILLEGAL]) unless the session was built with
      // spark.sql.legacy.parquet.nanosAsLong=true (GraftSession sets it at
      // construction — deliberately NOT mutated here, so building this plan
      // never changes how unrelated reads behave). Nanos come in as long;
      // floor-convert to microseconds — identical to DuckDB's ns→µs
      // truncation.
      require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
        "events.parquet is TIMESTAMP(NANOS): build the session via graft.GraftSession " +
          "(or set spark.sql.legacy.parquet.nanosAsLong=true at construction)")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}

/** One declared operator query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Queries without an oracle get the driver's weaker rows-only check.
  */
final case class QDef(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

object QDef {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): QDef =
    QDef(fn, Some(sql))
}
