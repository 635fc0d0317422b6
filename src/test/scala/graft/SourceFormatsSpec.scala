package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.2 source/sink formats beyond parquet: the same query plans run over
  * csv and json copies of a table (the engine is format-agnostic above
  * `spark.read`), and results round-trip losslessly for these column
  * types.
  */
class SourceFormatsSpec extends AnyFunSuite {
  import TestSpark._

  test("a query plan is format-agnostic across parquet, csv, and json") {
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    val nation = Tables(spark, sf, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    nation.write.mode("overwrite").json(s"$dir/nation_json")

    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("n_regionkey").cast("long").as("rk"))
        .agg(count(lit(1)).as("n"))
        .orderBy("rk")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val fromParquet = agg(nation)
    val fromCsv = agg(spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/nation_csv")
      .withColumn("n_regionkey", col("n_regionkey").cast("long")))
    val fromJson = agg(spark.read.json(s"$dir/nation_json"))
    assert(fromCsv == fromParquet, "csv path diverged")
    assert(fromJson == fromParquet, "json path diverged")
    assert(fromParquet.map(_._2).sum == nation.count())
  }

  test("orc round-trips the full column set losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-orc").toString
    val lineitem = Tables(spark, sf, "lineitem")
    lineitem.write.mode("overwrite").orc(s"$dir/lineitem_orc")
    val back = spark.read.orc(s"$dir/lineitem_orc")
    assert(back.schema == lineitem.schema, "orc schema drifted")
    // same aggregate over both paths — exact integer comparison
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("q"))
        .orderBy("l_returnflag")
        .collect().map(_.toSeq).toSeq
    assert(agg(back) == agg(lineitem), "orc path diverged")
  }
}
