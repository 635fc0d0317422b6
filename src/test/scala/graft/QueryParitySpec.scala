package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.localBuilder("8").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Smoke-level checks on every declared query: runs at sf0.001, schema is
  * non-empty, and queries that must return rows do. (Value-level parity vs
  * DuckDB is the driver's gate; locally run tools/check_parity.py.)
  */
class QueryParitySpec extends AnyFunSuite {
  import TestSpark._

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  // Queries legitimately empty at some SF (anti-join finds no order-less
  // customers, etc.) — exempt from the rows>0 smoke check.
  // (q03/q14 have selective filters that only match from sf0.01 up — the
  // parity gate's scale — and can be empty on the 10× smaller smoke data.)
  // (u03's top-2k ∩ neighbors ∩ meta-filter intersection is legitimately
  // empty on the 500-vector smoke data — parity-confirmed vs DuckDB.)
  private val mayBeEmpty = Set("q12_join_anti", "q20_except", "q03_like_in_between",
    "q14_group_having", "u03_similar_connected_filtered", "g13_geo_radius")

  SparkEntry.allDefs.foreach { case (name, qd) =>
    test(s"$name runs at sf0.001") {
      val df = qd.fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
