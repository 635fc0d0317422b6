package graft

/** Driver-contract benchmark: times every declared query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"failed":[...],"sf":...}`.
  *
  * An untimed warmup (the flagship `entry`) absorbs JVM/codegen startup so
  * per-query numbers reflect steady-state; queries run in name order so
  * runs are comparable across rounds. A query that throws is reported as
  * -1.0 (and listed in "failed") rather than having its
  * wall-time-to-exception pollute the timings; failures don't count toward
  * the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)

    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }

    val results = SparkEntry.allDefs.map(_._1).sorted.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
