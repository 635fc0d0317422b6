package graft

import graft.vector.AnnIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall checks for the MLlib-backed approximate indexes against the
  * exact brute-force operators (approximate ≠ oracle-checkable; quality
  * is asserted as recall against the exact answer instead).
  */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark._

  test("KMeans-IVF recall@10 vs exact brute force") {
    val emb = Tables(spark, sf, "embeddings")
    val query = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val exact = SparkEntry.queries("v01_similar_topk_cosine")(spark, sf)
      .collect().map(_.getLong(0)).toSet

    val index = AnnIndex.buildIvf(emb.filter(col("vec_id") =!= 0), k = 8)
    val approx = AnnIndex.searchIvf(index, query, k = 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSet

    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall (exact=$exact approx=$approx)")
    // full probe = exact: nprobe = k cells must reproduce brute force
    val full = AnnIndex.searchIvf(index, query, k = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(full == exact, s"nprobe=k should be exact: $full vs $exact")
  }

  test("MinHashLSH finds the planted near-duplicate pairs") {
    val docs = Tables(spark, sf, "documents")
    val pairs = AnnIndex.minHashNearDups(docs, maxDist = 0.3)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact high-similarity pairs from the oracle-checked word-jaccard op
    val exact = SparkEntry.queries("d03_neardup_word_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 1.0
    else (exact intersect found).size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall too low: $recall (missed ${exact diff found})")
  }
}
