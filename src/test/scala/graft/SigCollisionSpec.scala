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

  test("d09 witness check: planted gram-hash collision kills the query") {
    import spark.implicits._
    // Three rows, two DISTINCT gram texts forced onto one shuffle key
    // (g = 7): the independently-hashed witness column differs inside the
    // group, so the in-plan assert must fire — at the within-doc level
    // (doc 1 holds both texts) and at the cross-doc level alike.
    val planted = Seq((1L, "a", "gram one"), (1L, "a", "gram two"),
        (2L, "a", "gram one")).toDF("doc_id", "source", "gs")
      .select(col("doc_id"), col("source"), lit(7L).as("g"),
        xxhash64(col("gs")).as("w"))
    val (pdg, dupG) = graft.pipeline.PipelineQueries.d09GramDocCounts(planted)
    val e = intercept[Exception] { dupG.count() }
    assert(e.getMessage.contains("collision"), e.getMessage)
    // No collision -> same counts as grouping by the gram text itself
    // (differential check of the hash-keyed shape on real sf data).
    val grams = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), explode(split(col("text"), "\\s+")).as("gs"))
      .select(col("doc_id"), col("source"),
        xxhash64(col("gs")).as("g"), xxhash64(lit("d09w"), col("gs")).as("w"))
    val (pdgOk, dupOk) = graft.pipeline.PipelineQueries.d09GramDocCounts(grams)
    val byText = Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("gs"))
      .groupBy("gs", "doc_id").count()
    assert(pdgOk.count() == byText.count())
    assert(dupOk.count() ==
      byText.groupBy("gs").count().filter(col("count") >= 2).count())
  }

  test("t09 join witness: planted gram-hash collision kills the query") {
    import spark.implicits._
    // Two docs in different sources holding DIFFERENT gram texts forced
    // onto one join key: the witness hashes differ at the join, so the
    // in-plan assert must fire instead of fabricating a shared-gram pair.
    val planted = Seq((1L, "a", "gram one"), (2L, "b", "gram two"))
      .toDF("doc_id", "source", "gs")
      .select(col("doc_id"), col("source"), lit(7L).as("g"),
        xxhash64(col("gs")).as("w"))
    val e = intercept[Exception] {
      graft.pipeline.PipelineQueries.t09SharedGramPairs(planted).count()
    }
    assert(e.getMessage.contains("collision"), e.getMessage)
    // No collision -> identical pair counts to the text-keyed join
    // (differential check of the hash-keyed shape on real sf data).
    def gramsOf(c: org.apache.spark.sql.Column) = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), "\\s+").as("a"))
      .filter(size(col("a")) >= 5)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(0, size(a)-5), j -> concat_ws(' ', a[j], a[j+1], a[j+2], a[j+3], a[j+4]))")).as("gs"))
      .select(col("doc_id"), col("source"), c.as("g"),
        xxhash64(lit("t09w"), col("gs")).as("w")).distinct()
    val hashed = graft.pipeline.PipelineQueries
      .t09SharedGramPairs(gramsOf(xxhash64(col("gs")))).collect()
    val byText = graft.pipeline.PipelineQueries
      .t09SharedGramPairs(gramsOf(col("gs"))).collect()
    assert(hashed.toSeq == byText.toSeq)
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
