package graft

import graft.graph.{Algorithms, TpchGraph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only microbenchmark for iterative-loop strategies (not part of the
  * driver contract). Times pageRank variants to locate per-iteration
  * overhead: lazy checkpoint vs eager vs none.
  */
object DevTiming {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[devtiming] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }

    val edges = TpchGraph.treeEdges(spark, d)
    val nodes = TpchGraph.nodes(spark, d)
    edges.count(); nodes.count() // warm cache

    def prNoCkpt(iters: Int): DataFrame = {
      val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      val contrib = edges.join(outDeg, "src")
      var pr = nodes.select(col("key"), lit(1.0).as("pr"))
      for (_ <- 1 to iters) {
        val mass = pr.join(contrib, col("key") === col("src"))
          .select(col("dst"), (col("pr") / col("od")).as("m"))
          .groupBy("dst").agg(sum("m").as("mass"))
        pr = nodes.select(col("key"))
          .join(mass, col("key") === col("dst"), "left")
          .select(col("key"), (lit(0.15) + lit(0.85) * coalesce(col("mass"), lit(0.0))).as("pr"))
      }
      pr
    }
    def prEager(iters: Int): DataFrame = {
      val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      val contrib = edges.join(outDeg, "src")
      var pr = nodes.select(col("key"), lit(1.0).as("pr"))
      for (_ <- 1 to iters) {
        val mass = pr.join(contrib, col("key") === col("src"))
          .select(col("dst"), (col("pr") / col("od")).as("m"))
          .groupBy("dst").agg(sum("m").as("mass"))
        pr = nodes.select(col("key"))
          .join(mass, col("key") === col("dst"), "left")
          .select(col("key"), (lit(0.15) + lit(0.85) * coalesce(col("mass"), lit(0.0))).as("pr"))
          .localCheckpoint()
      }
      pr
    }

    // warmup the codepaths once
    time("warmup current")(Algorithms.pageRank(edges, nodes, 10).count())
    time("pageRank lazy-ckpt (now)")(Algorithms.pageRank(edges, nodes, 10).count())
    time("pageRank eager-ckpt")(prEager(10).count())
    time("pageRank no-ckpt")(prNoCkpt(10).count())
    time("pageRank no-ckpt again")(prNoCkpt(10).count())
    time("bfs depth3 (now)")(
      Algorithms.bfs(TpchGraph.undirected(TpchGraph.edges(spark, d)), "region:0", 3).count())
    spark.stop()
  }
}
