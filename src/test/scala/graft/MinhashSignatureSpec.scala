package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validates the two MinHash constructions and the streaming dedup
  * built on the map-side one:
  *  - `PipelineQueries.withMinhashSignature` builds the 16-hash signature
  *    per ROW with array HOFs (zero shuffle);
  *  - d04 builds the same hashes via explode + groupBy + 16 min() aggs.
  *  Signature-for-signature equality proves the map-side form computes
  *  the identical artifact — which is what licenses using it in a
  *  streaming ingest path where a shuffle-per-doc is not an option.
  */
class MinhashSignatureSpec extends AnyFunSuite {
  import TestSpark._

  // d04's construction, reproduced independently: explode shingles,
  // hash, 16 grouped mins, comma-joined in hash order.
  private def aggregateSignatures(): Map[Long, String] = {
    val P = 2147483647L
    val hashAB = (0 until 16).map(i =>
      (((2654435761L * (i + 1)) % P) | 1L, (40503L * (i + 7) * 9973L) % P))
    val sh = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws)-3), j -> concat_ws(' ', ws[j], ws[j+1], ws[j+2]))")).as("sh"))
      .distinct()
      .withColumn("v",
        expr("CAST(conv(substr(md5(cast(sh as binary)), 1, 7), 16, 10) AS BIGINT)"))
    val minAggs = hashAB.zipWithIndex.map { case ((a, b), i) =>
      min(expr(s"($a * v + $b) % $P")).as(s"mh$i")
    }
    sh.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
      .selectExpr("doc_id",
        s"concat_ws(',', ${(0 until 16).map(i => s"mh$i").mkString(", ")}) AS sig")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("map-side HOF signature equals the aggregate-built d04 signature") {
    val rowSide = graft.pipeline.PipelineQueries
      .withMinhashSignature(Tables(spark, sf, "documents"))
      .filter(col("mh_sig") =!= "")
      .select("doc_id", "mh_sig")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val aggSide = aggregateSignatures()
    assert(rowSide.keySet == aggSide.keySet)
    assert(rowSide == aggSide, "the two constructions must agree per doc")
    assert(rowSide.nonEmpty)
  }

  test("streaming minhash dedup keeps one doc per signature") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams
      .minhashDedupStream(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "mh_sig")
      .writeStream.outputMode("append")
      .format("memory").queryName("mh_dedup_out")
      .start()
    try {
      // feed every doc twice across two batches: the stream must emit
      // each signature exactly once (first occurrence wins)
      val (h1, h2) = docs.splitAt(docs.length / 2)
      mem.addData(h1 ++ h1); q.processAllAvailable()
      mem.addData(h2 ++ h2 ++ h1); q.processAllAvailable()
      val streamed = spark.table("mh_dedup_out").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(streamed.map(_._2).distinct.length == streamed.length,
        "every signature must appear exactly once")
      val batchSigs = graft.pipeline.PipelineQueries
        .withMinhashSignature(docs.toSeq.toDF("doc_id", "text"))
        .filter(col("mh_sig") =!= "")
        .select("mh_sig").distinct().collect().map(_.getString(0)).toSet
      assert(streamed.map(_._2).toSet == batchSigs,
        "streamed signature set must equal the batch signature set")
    } finally q.stop()
  }
}
