package graft.graph

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: array-formulated wedge generation for g08/g28 — suppliers
  * per part collected once, pairs generated row-locally with
  * higher-order array functions (no self-join, no second exchange of
  * the spc frame). Cold-JVM timing: run this main fresh. */
object DevG08b {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1.0")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[devg08b] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }

    val sp = Tables(s, d, "lineitem").select(col("l_suppkey"), col("l_partkey")).distinct()
    val sz = sp.groupBy("l_suppkey").agg(count(lit(1)).as("n"))
    // one aggregation replaces distinct + pdeg + filter join: suppliers
    // per part, cap applied on the collected size
    val parts = sp.groupBy("l_partkey")
      .agg(sort_array(collect_set(col("l_suppkey"))).as("ss"))
      .withColumn("pdeg", size(col("ss")))
      .filter(col("pdeg") <= 200)
    val wedges = parts.select(col("pdeg"),
      explode(expr(
        """flatten(transform(ss, (x, i) ->
          |  transform(slice(ss, i + 2, size(ss) - i - 1), y ->
          |    struct(x AS sa, y AS sb))))""".stripMargin)).as("p"))
      .select(col("p.sa"), col("p.sb"), col("pdeg"))
    val agg = wedges.groupBy("sa", "sb")
      .agg(count(lit(1)).as("common_n"),
        sum(round(lit(1e6) / log(col("pdeg")), 0).cast("long")).as("aa_q"),
        sum(round(lit(1e6) / col("pdeg"), 0).cast("long")).as("ra_q"))
    val aggC = Algorithms.memo(agg)
    val szC = Algorithms.memo(sz)
    def widen(a: DataFrame): DataFrame = a.select(col("sa"), col("sb"), col("common_n"),
      (col("aa_q") / 1e6).as("adamic_adar"), (col("ra_q") / 1e6).as("resource_alloc"))
    def g08(a: DataFrame, z: DataFrame): Long =
      a.join(z.select(col("l_suppkey").as("sa"), col("n").as("na")), Seq("sa"))
        .join(z.select(col("l_suppkey").as("sb"), col("n").as("nb")), Seq("sb"))
        .select(col("sa"), col("sb"),
          round(col("common_n") / (col("na") + col("nb") - col("common_n")), 4).as("jaccard"))
        .orderBy(desc("jaccard"), col("sa"), col("sb")).limit(20).count()
    def g28(a: DataFrame, z: DataFrame): Long =
      a.join(z.select(col("l_suppkey").as("sa"), col("n").as("na")), Seq("sa"))
        .join(z.select(col("l_suppkey").as("sb"), col("n").as("nb")), Seq("sb"))
        .select(col("sa"), col("sb"), col("common_n"),
          (col("na") * col("nb")).as("pref_attach"),
          col("adamic_adar"), col("resource_alloc"))
        .orderBy(desc("common_n"), col("sa"), col("sb")).limit(20).count()
    time("g08 array-wedge (cold build)")(g08(widen(aggC), szC))
    time("g28 array-wedge (hit)")(g28(widen(aggC), szC))
    time("agg rows")(aggC.count())
    s.stop()
  }
}
