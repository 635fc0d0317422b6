package graft

import org.scalatest.funsuite.AnyFunSuite

/** The d03 set-similarity join has two implementations behind one
  * dispatcher (round 10): the general-vocabulary Vernica/PPJoin prefix
  * path and the ≤64-word dictionary-bitmask fast path the gate corpora
  * take. Both must produce IDENTICAL (da, db, jaccard) sets — c =
  * popcount(maskA & maskB) is exactly array_intersect size, so even the
  * double jaccard values must agree bit-for-bit. */
class D03PathsSpec extends AnyFunSuite {
  import TestSpark._

  test("bitmask fast path ≡ general prefix path on the sf0.001 corpus") {
    def pairsOf(bitmask: Boolean): Set[(Long, Long, Double)] =
      graft.pipeline.PipelineQueries
        .wordJaccardPairsPath(spark, sf, forceBitmask = Some(bitmask))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fast = pairsOf(bitmask = true)
    val general = pairsOf(bitmask = false)
    assert(fast.nonEmpty, "corpus must produce near-dup pairs")
    assert(fast == general,
      s"paths diverged: only-fast=${(fast -- general).take(5)} " +
        s"only-general=${(general -- fast).take(5)}")
  }
}
