package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check for t21's closed-form chunk arithmetic: the DataFrame
  * expressions encode `nch`, `last_len`, and `sum_chunk_tokens` as pure
  * arithmetic (no explode); this spec pins those formulas against a
  * brute-force chunk enumeration over randomized (ntok, window, stride)
  * — including the boundary shapes (ntok == w, ntok == w+1, stride == w,
  * exact multiples) where off-by-ones live.
  */
class ChunkFormulaSpec extends AnyFunSuite {

  /** The closed forms used by PipelineQueries.chunkCensus. */
  private def closed(ntok: Long, w: Long, stride: Long): (Long, Long, Long) = {
    val nch = if (ntok <= w) 1L else (ntok - w + stride - 1) / stride + 1
    val lastLen = math.min(w, ntok - (nch - 1) * stride)
    val sum = (nch - 1) * w + lastLen
    (nch, lastLen, sum)
  }

  /** Brute-force enumeration: chunk i covers [i*stride, min(i*stride+w,
    * ntok)); the last chunk is the first whose window reaches the end. */
  private def brute(ntok: Long, w: Long, stride: Long): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var i = 0L
    var done = false
    while (!done) {
      val start = i * stride
      val end = math.min(start + w, ntok)
      out += ((start, end))
      done = start + w >= ntok
      i += 1
    }
    out.result()
  }

  private val gen: Gen[(Long, Long, Long)] = for {
    w <- Gen.choose(1L, 80L)
    stride <- Gen.choose(1L, w)
    ntok <- Gen.oneOf(
      Gen.choose(1L, 500L),
      Gen.oneOf(w - 1, w, w + 1, w + stride, 2 * w, 3 * stride + w).map(math.max(1L, _)))
  } yield (ntok, w, stride)

  test("closed-form chunk count/lengths equal brute-force enumeration") {
    (1 to 300).foreach { k =>
      val (ntok, w, stride) = gen.apply(Gen.Parameters.default, Seed(k.toLong)).get
      val chunks = brute(ntok, w, stride)
      val (nch, lastLen, sum) = closed(ntok, w, stride)
      assert(nch == chunks.length.toLong,
        s"nch mismatch at ntok=$ntok w=$w stride=$stride: $nch vs ${chunks.length}")
      assert(lastLen == chunks.last._2 - chunks.last._1,
        s"last_len mismatch at ntok=$ntok w=$w stride=$stride")
      assert(sum == chunks.map(c => c._2 - c._1).sum,
        s"sum_chunk_tokens mismatch at ntok=$ntok w=$w stride=$stride")
      // every chunk except the last is exactly full — the claim the
      // closed forms rest on
      assert(chunks.init.forall(c => c._2 - c._1 == w))
      // full coverage, no gap: chunk i+1 starts inside (or at the end
      // of) chunk i's window since stride <= w
      assert(chunks.last._2 == ntok)
    }
  }
}
