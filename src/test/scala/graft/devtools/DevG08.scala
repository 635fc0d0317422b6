package graft.graph

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only profiler for the g08/g28 shared co-occurrence artifact (not
  * part of the driver contract): measures the pair-aggregate size and
  * the A/B of memoization strategies at the target SF. */
object DevG08 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1.0")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[devg08] $label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }

    def build(): (DataFrame, DataFrame, DataFrame) = {
      val sp = Tables(s, d, "lineitem").select(col("l_suppkey"), col("l_partkey")).distinct()
      val sz = sp.groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      val pd = sp.groupBy("l_partkey").agg(count(lit(1)).as("pdeg"))
      val spc = sp.join(pd.filter(col("pdeg") <= 200).select("l_partkey"), Seq("l_partkey"))
      val spcM = Algorithms.memo(spc)
      val pairs = spcM.select(col("l_suppkey").as("sa"), col("l_partkey"))
        .hint("shuffle_hash")
        .join(spcM.select(col("l_suppkey").as("sb"), col("l_partkey")), Seq("l_partkey"))
        .filter(col("sa") < col("sb"))
      val agg = pairs.join(pd, Seq("l_partkey"))
        .groupBy("sa", "sb")
        .agg(count(lit(1)).as("common_n"),
          (sum(round(lit(1e6) / log(col("pdeg")), 0).cast("long")) / 1e6).as("adamic_adar"),
          (sum(round(lit(1e6) / col("pdeg"), 0).cast("long")) / 1e6).as("resource_alloc"))
      (agg, sz, spcM)
    }

    def g08(agg: DataFrame, sz: DataFrame): Long =
      agg.join(sz.select(col("l_suppkey").as("sa"), col("n").as("na")), Seq("sa"))
        .join(sz.select(col("l_suppkey").as("sb"), col("n").as("nb")), Seq("sb"))
        .select(col("sa"), col("sb"),
          round(col("common_n") / (col("na") + col("nb") - col("common_n")), 4).as("jaccard"))
        .orderBy(desc("jaccard"), col("sa"), col("sb")).limit(20).count()

    def g28(agg: DataFrame, sz: DataFrame): Long =
      agg.join(sz.select(col("l_suppkey").as("sa"), col("n").as("na")), Seq("sa"))
        .join(sz.select(col("l_suppkey").as("sb"), col("n").as("nb")), Seq("sb"))
        .select(col("sa"), col("sb"), col("common_n"),
          (col("na") * col("nb")).as("pref_attach"),
          col("adamic_adar"), col("resource_alloc"))
        .orderBy(desc("common_n"), col("sa"), col("sb")).limit(20).count()

    // warm the source read
    val (agg0, sz0, _) = build()
    time("agg count (recompute, warm)")(agg0.count())
    time("g08 uncached agg")(g08(agg0, sz0))
    time("g28 uncached agg")(g28(agg0, sz0))

    val (agg1, sz1, _) = build()
    val aggC = Algorithms.memo(agg1)
    val szC = Algorithms.memo(sz1)
    time("g08 cached agg (build)")(g08(aggC, szC))
    time("g28 cached agg (hit)")(g28(aggC, szC))
    time("g08 cached agg (hit)")(g08(aggC, szC))

    // compact variant: quantized LONG sums in the cached frame, divide
    // at read — narrower blocks, same values
    def buildCompact(): (DataFrame, DataFrame) = {
      val sp = Tables(s, d, "lineitem").select(col("l_suppkey"), col("l_partkey")).distinct()
      val sz2 = sp.groupBy("l_suppkey").agg(count(lit(1)).as("n"))
      val pd = sp.groupBy("l_partkey").agg(count(lit(1)).as("pdeg"))
      val spc = sp.join(pd.filter(col("pdeg") <= 200).select("l_partkey"), Seq("l_partkey"))
      val spcM = Algorithms.memo(spc)
      val pairs = spcM.select(col("l_suppkey").as("sa"), col("l_partkey"))
        .hint("shuffle_hash")
        .join(spcM.select(col("l_suppkey").as("sb"), col("l_partkey")), Seq("l_partkey"))
        .filter(col("sa") < col("sb"))
      val aggQ = pairs.join(pd, Seq("l_partkey"))
        .groupBy("sa", "sb")
        .agg(count(lit(1)).as("common_n"),
          sum(round(lit(1e6) / log(col("pdeg")), 0).cast("long")).as("aa_q"),
          sum(round(lit(1e6) / col("pdeg"), 0).cast("long")).as("ra_q"))
      (aggQ, sz2)
    }
    val (aggQ, sz2) = buildCompact()
    val aggQC = Algorithms.memo(aggQ)
    val szQC = Algorithms.memo(sz2)
    def widen(a: DataFrame): DataFrame = a.select(col("sa"), col("sb"), col("common_n"),
      (col("aa_q") / 1e6).as("adamic_adar"), (col("ra_q") / 1e6).as("resource_alloc"))
    time("g08 compact cache (build)")(g08(widen(aggQC), szQC))
    time("g28 compact cache (hit)")(g28(widen(aggQC), szQC))
    s.stop()
  }
}
