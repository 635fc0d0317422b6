package graft

import graft.graph.GraphQueries
import graft.nql.Nql
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the central memo registry ([[graft.Memo]]): derived
  * artifacts drop and unpersist on `clearArtifacts` and rebuild on next
  * use with identical results; session user state (a built ANN index)
  * survives `clearArtifacts` and is dropped only by `close`.
  */
class MemoLifecycleSpec extends AnyFunSuite {
  import TestSpark._

  test("clearArtifacts drops memoized frames, unpersists them, and queries rebuild identically") {
    // Build a memoized artifact (whole-graph triangle stats) via a gate query.
    val q = SparkEntry.queries("g51_triangles_whole_graph")
    val before = q(spark, sf).collect().toSeq
    val stats = GraphQueries.triStatsCanonical(spark, sf)
    assert(stats.storageLevel != StorageLevel.NONE,
      "the memoized triangle-stats frame must be cache()d")
    assert(Memo.entryCount(spark) > 0)

    Memo.clearArtifacts(spark)
    assert(stats.storageLevel == StorageLevel.NONE,
      "clearArtifacts must unpersist the dropped frame")

    // Rebuild on demand: a fresh frame instance with identical results.
    val after = q(spark, sf).collect().toSeq
    assert(after == before)
    assert(GraphQueries.triStatsCanonical(spark, sf) ne stats,
      "the artifact must have been rebuilt, not resurrected")
  }

  // The index registry is private[nql]; observe it through the statement
  // surface: SIMILAR … USING INDEX routes through a built index and throws
  // "no ANN index built" without one.
  private def routedSearch() =
    Nql.execute(spark, sf, "SIMILAR 'vec:0' LIMIT 3 USING INDEX").collect()

  test("user state (built ANN index) survives clearArtifacts; close drops it") {
    Nql.execute(spark, sf, "EMBED BUILD INDEX IVF").collect()
    assert(routedSearch().nonEmpty)

    Memo.clearArtifacts(spark)
    assert(routedSearch().nonEmpty,
      "a user-built index is session STATE, not a derived artifact")

    Memo.close(spark)
    assert(Memo.entryCount(spark) == 0)
    val ex = intercept[Exception] { routedSearch() }
    assert(ex.getMessage.contains("no ANN index built"))

    // The session remains fully usable: rebuild the index afresh.
    Nql.execute(spark, sf, "EMBED BUILD INDEX IVF").collect()
    assert(routedSearch().nonEmpty)
  }
}
