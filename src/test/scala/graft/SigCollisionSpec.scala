package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The d03/d10 pipelines carry 8-byte xxhash64 signatures instead of the
  * wide string identities they stand for; a silent hash collision would
  * collapse two distinct sets. `requireNoSigCollisions` is the tripwire
  * (count-distinct input vs count-distinct signature, once per
  * session+dir) — this spec PLANTS a collision to prove the tripwire
  * fires, and runs the real hash on the real corpus to prove it passes.
  */
class SigCollisionSpec extends AnyFunSuite {
  import TestSpark._

  test("planted collision trips the guard") {
    import spark.implicits._
    // two distinct inputs, one constant "signature" — a forced collision
    val df = Seq("alpha", "beta").toDF("x")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.PipelineQueries.requireNoSigCollisions(
        df, col("x"), lit(1L), "planted")
    }
    assert(e.getMessage.contains("collision"), e.getMessage)
    assert(e.getMessage.contains("planted"), e.getMessage)
  }

  test("xxhash64 over the sf corpus word sets passes the guard") {
    val sets = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), "\\s+").as("wa"))
      .select(concat_ws(" ", array_distinct(col("wa"))).as("input"))
    // must NOT throw: distinct inputs == distinct hashes on real data
    graft.pipeline.PipelineQueries.requireNoSigCollisions(
      sets, col("input"), xxhash64(col("input")), "sf corpus")
  }
}
