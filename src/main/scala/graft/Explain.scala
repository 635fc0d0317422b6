package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints `explain("formatted")` for the named queries (or a
  * representative default set) so pushdown/broadcast/codegen can be
  * inspected:  sbt 'runMain graft.Explain q01_agg_pricing_summary'
  */
object Explain {
  val defaultSet = Seq(
    "q01_agg_pricing_summary", "q02_filter_project_sort", "q13_join_multiway",
    "v01_similar_topk_cosine", "d04_neardup_minhash_lsh", "q21_window_topk_per_group",
    "q33_asof_join", "q34_range_join", "t07_tfidf_keywords", "g25_biconnected",
    "d13_incremental_dedup", "t21_chunk_census", "v19_binary_sign_search")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus)
    val names = if (args.nonEmpty) args.toSeq else defaultSet
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
