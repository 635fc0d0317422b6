package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fulltext inverted index, materialized as DataFrames (reference fulltext
  * index `graph_engine/src/lib.rs` tokenize/search — rebuilt lakehouse-
  * style instead of as an in-memory map).
  *
  * Two representations, by scale:
  *  - `tokenPairs`: one (token, doc_id) row per distinct containment.
  *    This IS the scalable index — at 100 TB it partitions by token hash,
  *    a term lookup is a partition-pruned scan, and an AND-query is a
  *    shuffle-light count-match aggregation. Stop-word tokens skew; writers
  *    should bucket by token (`.write.bucketBy(n, "token")`) so lookups
  *    and intersections co-locate.
  *  - `build`: the compact (token, postings[], df) form — right for
  *    dictionary-sized serving snapshots, wrong for hot-token postings that
  *    outgrow a task (a web-scale 'the' posting list is bigger than an
  *    executor); keep the pair form as the source of truth.
  *
  * Tokenization is the deterministic lowercase alphanumeric split shared
  * with the oracle: `lower(text)` split on `[^a-z0-9]+`.
  */
object InvertedIndex {

  /** Distinct (token, doc_id) pairs — the scalable index representation. */
  def tokenPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "[^a-z0-9]+")).as("token"))
      .filter(col("token") =!= "")
      .distinct()

  /** Compact posting-list index: token → sorted doc ids + document freq. */
  def build(pairs: DataFrame): DataFrame =
    pairs.groupBy("token")
      .agg(sort_array(collect_list("doc_id")).as("postings"),
        count(lit(1)).as("df"))

  /** Conjunctive AND search: documents containing every term. One shuffle
    * on doc_id; the token filter partition-prunes on a token-partitioned
    * index.
    */
  def searchAll(pairs: DataFrame, terms: Seq[String]): DataFrame =
    pairs.filter(col("token").isin(terms: _*))
      .groupBy("doc_id").agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") === terms.length)
      .select("doc_id")

  /** Prefix lookup over the compact index (token dictionary scan). */
  def prefix(index: DataFrame, p: String): DataFrame =
    index.filter(col("token").startsWith(p))
}
