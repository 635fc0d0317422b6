package graft.vector

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Dev-only: the AnnIndexSpec recall@10 curve measured at an arbitrary
  * SF (round 10, VERDICT r9 item 6 — the CI floors run on gate-sized
  * vectors; sf1.0's 10×-denser cells can shift IVF balance, so the
  * curve is re-measured on the big table instead of assumed). Prints
  * mean recall@10 for nprobe 1..6 over 20 held-out queries, exact
  * baseline = nprobe = k (provably brute-force, AnnIndexSpec). */
object DevAnnSf1 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1.0")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = Tables(spark, d, "embeddings")
    val n = emb.count()
    val all = emb.filter(col("vec_id") >= 20)
    val index = AnnIndex.buildIvf(all, k = 8)
    val queries = emb.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    println(s"[devann] corpus=$n queries=${queries.length} sf=$d")
    val exactSets = queries.map { case (id, q) =>
      id -> AnnIndex.searchIvf(index, q, k = 10, nprobe = 8)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    for (np <- 1 to 6) {
      val per = queries.map { case (id, q) =>
        val approx = AnnIndex.searchIvf(index, q, k = 10, nprobe = np)
          .collect().map(_.getLong(0)).toSet
        (exactSets(id) intersect approx).size.toDouble / exactSets(id).size
      }
      println(f"[devann] nprobe=$np mean_recall@10=${per.sum / per.length}%.3f")
    }
    spark.stop()
  }
}
