package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE merge-discovery semantics on crafted corpora where the
  * expected merges are hand-computable: chained occurrences all merge in
  * one pass (the double-space separator makes the replace scan canonical
  * leftmost-greedy BPE), a self-adjacent pair inside an odd run merges
  * floor(n/2) times exactly like reference BPE, and count ties break
  * lexicographically on the pair.
  */
class BpeMergesSpec extends AnyFunSuite {
  import TestSpark._

  private def merges(texts: Seq[String], rounds: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    graft.pipeline.PipelineQueries
      .bpeMergesOf(texts.toDF("text"), rounds)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
  }

  test("pair counts weight by word frequency and merges chain") {
    // corpus: 'abab' x3, 'ab' x2 -> round 1: 'a b' appears 2x in abab,
    // 1x in ab => weighted 3*2 + 2*1 = 8, beats 'b a' (3). merged 'ab'.
    // round 2: sequences 'ab ab' (x3) and 'ab' (x2) -> 'ab ab' wins (3).
    val out = merges(Seq("abab abab abab ab ab"), 2)
    assert(out == Seq((1, "a b", "ab", 8L), (2, "ab ab", "abab", 3L)))
  }

  test("count ties break lexicographically on the pair") {
    // 'ab' and 'cd': pairs 'a b' and 'c d' both weighted 1 -> 'a b' wins
    val out = merges(Seq("ab cd"), 1)
    assert(out == Seq((1, "a b", "ab", 1L)))
  }

  test("self-adjacent pair follows the documented replace scan") {
    // 'aaa': round 1 pairs 'a a' x2 -> merge 'a a'. Replace scan on
    // ' a a a ' consumes the shared boundary: exactly one merge fires,
    // leaving 'aa a'. Round 2 then sees pair 'aa a' once.
    val out = merges(Seq("aaa"), 2)
    assert(out == Seq((1, "a a", "aa", 2L), (2, "aa a", "aaa", 1L)))
  }

  test("words below two letters and non-letters are excluded") {
    // digits/punct stripped by the [a-z]+ extraction; 'a' (len 1) excluded
    val out = merges(Seq("a a a xy 42 !!"), 1)
    assert(out == Seq((1, "x y", "xy", 1L)))
  }
}
