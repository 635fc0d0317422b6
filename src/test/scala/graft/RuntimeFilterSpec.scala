package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Proves the runtime bloom-filter row-level join filter — Spark's
  * adaptive answer to "the dim side is selective, prune the fact scan
  * before the shuffle" — activates under this project's session config.
  * At 100 TB this is the difference between shuffling the whole fact
  * table and shuffling only rows whose join key might match the filtered
  * dim side (the optimizer injects `might_contain(bloom(dim.key))` onto
  * the fact side).
  *
  * The feature gates on size estimates (creation side small enough,
  * application side big enough), so the spec pins thresholds explicitly
  * rather than relying on defaults tuned for clusters.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def withConf[A](kv: (String, String)*)(body: => A): A = {
    val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective shuffle join injects a bloom might_contain on the fact side") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val fact = Tables(spark, sf, "lineitem")
      val dim = Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT") // selective, non-key
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected runtime bloom filter in optimized plan:\n$plan")
      // and the filter is a pure speedup: result matches the plain join
      val n = joined.collect().map(_.getLong(1)).sum
      val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey")).count()
      assert(n === plain)
    }
  }

  test("bloom filter does not fire when the dim side has no selective filter") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true") {
      val fact = Tables(spark, sf, "lineitem")
      val dim = Tables(spark, sf, "orders") // unfiltered: nothing to gain
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain"))
    }
  }
}
