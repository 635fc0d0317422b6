package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q32 has no SQL oracle (HLL sketches are implementation-specific), so
  * its correctness contract lives here: the estimate must stay within the
  * configured relative standard deviation (×4 for slack) of the exact
  * distinct count, per group.
  */
class ApproxDistinctSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_count_distinct tracks exact distinct within rsd bounds") {
    val events = Tables(spark, sf, "events")
    val approx = SparkEntry.queries("q32_approx_count_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) <= math.max(2.0, 0.08 * ex),
        s"$k: approx $ap vs exact $ex drifts past 4x rsd")
    }
  }
}
