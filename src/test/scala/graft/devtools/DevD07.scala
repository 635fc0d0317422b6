package graft.pipeline

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for d07's representative clustering (round 12):
  * times the shared set-pair artifact build (charged to d03, as in the
  * bench), then d07's CC + expansion on the warm artifact, and prints the
  * set-space vs doc-space graph sizes so the contraction win (or its
  * absence) is measured, not assumed. Run:
  * SPARK_GRAFT_SF_DIR=target/sf1.0 sbt 'Test/runMain graft.pipeline.DevD07'
  */
object DevD07 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1.0")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[devd07] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    time("d03 gate query (builds + memoizes the shared artifacts)") {
      graft.SparkEntry.queries("d03_neardup_word_jaccard")(spark, d).count()
    }
    time("d07 first run (artifacts warm, CC + expansion cold)") {
      graft.SparkEntry.queries("d07_dedup_cluster_stats")(spark, d).count()
    }
    time("d07 second run") {
      graft.SparkEntry.queries("d07_dedup_cluster_stats")(spark, d).count()
    }
    // graph sizes: set space vs doc space
    val (scored, memb) = (
      time("scored count (memoized)") {
        val p = PipelineQueries.wordJaccardSetPairsPath(spark, d, None)
        p
      })
    println(s"[devd07] setPairs=${scored.count()} docs=${memb.count()} " +
      s"sets=${memb.select("source", "sig").distinct().count()}")
    spark.stop()
  }
}
