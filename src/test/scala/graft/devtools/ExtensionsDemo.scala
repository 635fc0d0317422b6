package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drives GraftExtensions in its own session (extensions bind at session
  * construction):  sbt 'Test/runMain graft.plans.ExtensionsDemo'
  * Prints the optimized plan to show `l2_distance(…) <= r` rewritten to
  * the sqrt-free `l2_distance_squared(…) <= r²`, and checks result parity.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.localBuilder("4")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    emb.createOrReplaceTempView("embeddings")
    val radius = spark.sql(
      """SELECT a.vec_id AS va, b.vec_id AS vb
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE l2_distance(a.embedding, b.embedding) <= 1.05""".stripMargin)

    println("OPTIMIZED PLAN:")
    println(radius.queryExecution.optimizedPlan.toString.linesIterator.take(4).mkString("\n"))
    val viaRule = radius.count()

    // ground truth without the rewrite (explicit sqrt form on the column API)
    import graft.functions.VectorFunctions.l2_distance
    val a = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val direct = a.join(b, col("va") < col("vb"))
      .filter(l2_distance(col("ea"), col("eb")) <= 1.05).count()

    println(s"RESULT: rewritten=$viaRule direct=$direct match=${viaRule == direct}")
    spark.stop()
  }
}
