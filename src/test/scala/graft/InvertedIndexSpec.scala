package graft

import graft.text.InvertedIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Inverted index vs brute-force scans on the documents table. */
class InvertedIndexSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables(spark, sf, "documents")
  private lazy val pairs = InvertedIndex.tokenPairs(docs, "doc_id", "text")

  private def bruteHas(term: String) =
    docs.filter(array_contains(split(lower(col("text")), "[^a-z0-9]+"), term))

  test("df matches a brute-force containment scan") {
    val idx = InvertedIndex.build(pairs).cache()
    val dfVector = idx.filter(col("token") === "vector").collect()
    assert(dfVector.length == 1)
    assert(dfVector(0).getAs[Long]("df") == bruteHas("vector").count())
    // postings are sorted and consistent with df
    val postings = dfVector(0).getSeq[Long](dfVector(0).fieldIndex("postings"))
    assert(postings == postings.sorted && postings.length == dfVector(0).getAs[Long]("df"))
  }

  test("conjunctive search equals intersected brute scans") {
    val terms = Seq("vector", "stream", "hash")
    val viaIndex = InvertedIndex.searchAll(pairs, terms)
      .collect().map(_.getLong(0)).toSet
    val brute = terms.map(t => bruteHas(t).select("doc_id").collect().map(_.getLong(0)).toSet)
      .reduce(_ intersect _)
    assert(viaIndex == brute && viaIndex.nonEmpty)
  }

  test("prefix lookup scans the token dictionary") {
    val idx = InvertedIndex.build(pairs)
    val sp = InvertedIndex.prefix(idx, "sp").select("token").collect().map(_.getString(0))
    assert(sp.contains("spark"))
    assert(sp.forall(_.startsWith("sp")))
  }
}
