package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the co-located-join scale path: write both join sides bucketed
  * by the join key, and the join plan contains NO shuffle exchange — the
  * property that matters at 100 TB, where re-shuffling a fact table per
  * join is the dominant cost. (SURVEY §2.2/§4: the reference's hash
  * indexes ≈ bucketed layout + partition pruning on Spark.)
  */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    // AQE hides exchanges inside query-stage wrappers (stage nodes are
    // leaves of the adaptive plan tree), so a plain collect() over
    // children misses them: materialize, then recurse through
    // AdaptiveSparkPlanExec/QueryStageExec boundaries explicitly.
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case o => o.children
      }
      self + kids.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("join of two tables bucketed on the key runs with zero shuffles") {
    val n = 8
    // drop any previous run's tables AND their warehouse dirs (a stale
    // location fails CREATE TABLE even after DROP)
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    Tables(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(n, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables(spark, sf, "lineitem")
      .write.mode("overwrite").bucketBy(n, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_orderpriority")
    assert(shuffleCount(joined) == 0,
      s"bucketed join should be shuffle-free:\n${joined.queryExecution.executedPlan}")

    // same join on the raw parquet shuffles (or broadcasts) — bucketing is
    // what removed the exchange, not plan luck
    val raw = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders").hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_quantity", "o_orderpriority")
    assert(shuffleCount(raw) > 0, "un-bucketed shuffle-hash join should shuffle")

    // bucket-wise aggregation: groupBy the bucket key also needs no shuffle
    val agg = spark.table("lineitem_b").groupBy("l_orderkey").agg(sum("l_quantity"))
    assert(shuffleCount(agg) == 0, "groupBy on the bucket key should be shuffle-free")
  }
}
