package graft

/** Driver-contract benchmark: times every declared query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"failed":[...],"sf":...}`.
  *
  * MULTI-RUN MEDIANS (round 12): identical bytes drew 0.40x-2.61x per-query
  * swings between the r10 and r11 driver runs, so a single draw cannot be
  * trusted against a 2x performance gate. The suite now runs
  * `--runs N` (or env SPARK_GRAFT_RUNS, default 3) full sweeps and every
  * reported per-query number and the headline total are PER-QUERY MEDIANS
  * across draws. Raw draws are written alongside to SPARK_GRAFT_BENCH_OUT
  * (default `tools/bench_last.json`, relative to the launch cwd) so the
  * full-resolution artifact survives the harness's ~2 KB stdout-tail
  * capture window — per-query stdout JSON was head-truncated in BENCH_r11.
  *
  * An untimed warmup (the flagship `entry`) absorbs JVM/codegen startup so
  * per-query numbers reflect steady-state; queries run in name order so
  * runs are comparable across rounds.
  *
  * Output framing: the harness that captures this process keeps only the
  * last ~2000 bytes of stdout and parses the LAST JSON line, so the FINAL
  * line is a COMPLETE compact JSON (short query keys = the unique
  * `q32`/`g05`-style prefix of each query name, adaptive value precision)
  * sized to fit that window whole — round 12's total-only final line left
  * the driver with no per-query medians (PERF_r12.per_query empty). The
  * full-name and 3-decimal compact lines are printed immediately before it
  * for human readers and tools. Per-draw progress is printed as
  * `#`-prefixed lines so tools that grab the first `{"queries"` line
  * (tools/scaling_audit.py) always see the MEDIANS line. build.sbt sets
  * `Global / showSuccess := false` so no sbt epilogue follows.
  *
  * Failure policy: a query that throws in ANY draw is reported as -1.0 in
  * "queries", listed in "failed", and adds a fixed 999-second penalty to
  * the headline total — a regressing query can only ever make the total
  * worse, never quietly improve it.
  */
object Bench {
  private val FailPenaltySec = 999.0

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.size
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = {
      val fromArgs = args.sliding(2).collectFirst { case Array("--runs", n) => n.toInt }
      fromArgs.orElse(sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt)).getOrElse(3).max(1)
    }
    val rawOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "tools/bench_last.json")
    // Timed action. Default "count" — the action every round has timed, so
    // cross-round numbers stay comparable (the driver contract). "noop"
    // (guide §1.4) computes EVERY column of every row via the no-op sink,
    // immune to count()'s column pruning / sort elimination — used for
    // isolation work; the count-vs-noop delta for this suite is recorded in
    // OPTIMIZATION_r12.md.
    val sink = sys.env.getOrElse("SPARK_GRAFT_SINK", "count")
    require(sink == "count" || sink == "noop", s"SPARK_GRAFT_SINK=$sink (want count|noop)")
    val runQuery: org.apache.spark.sql.DataFrame => Unit =
      if (sink == "noop") df => df.write.format("noop").mode("overwrite").save()
      else df => { df.count(); () }
    val spark = GraftSession.local(cpus)

    // Untimed warmup at the smallest SF: the flagship entry plus one
    // query per family (Cypher compile path, iterative graph loop,
    // window, vector expression, text explode) so steady-state per-query
    // numbers aren't skewed by whichever family happens to run first.
    val warmSf = "/root/testdata/sf0.001"
    val warmups = Seq("c01_cypher_chain", "g03_bfs_depth3", "q21_window_topk_per_group",
      "v01_similar_topk_cosine", "t01_token_stats")
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    warmups.foreach { n =>
      try { SparkEntry.queries(n)(spark, warmSf).count() } catch { case _: Throwable => () }
    }

    // Dev aid: SPARK_GRAFT_ONLY=g05,g17 times just those queries (by name
    // prefix). Unset for the driver's full run.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.allDefs.map(_._1).sorted
      .filter(n => only.forall(_.exists(n.startsWith)))

    // `runs` full sweeps, each in name order. A draw that throws records
    // -1.0 for that (query, draw).
    val draws: Seq[Seq[(String, Double)]] = (1 to runs).map { draw =>
      val sweep = names.map { name =>
        val fn = SparkEntry.queries(name)
        // Label the jobs (guide §1.5) so UI/eventlog stages map to queries.
        spark.sparkContext.setJobDescription(s"bench: $name (draw $draw)")
        val t0 = System.nanoTime()
        val ok = try { runQuery(fn(spark, sfDir)); true } catch { case _: Throwable => false }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        spark.sparkContext.setJobDescription(null)
        // Outside the timed region: a driver GC lets ContextCleaner drop
        // the finished query's now-unreferenced checkpoint/cache blocks, so
        // each query starts from a clean block manager instead of paying
        // GC thrash for every prior query's leftovers. Memoized frames
        // (TpchGraph tables, g25/g26 labeling) hold strong refs and are
        // untouched.
        System.gc()
        (name, dt)
      }
      val total = sweep.map { case (_, v) => if (v < 0) FailPenaltySec else v }.sum
      println(f"# draw $draw/$runs total=$total%.1f s")
      sweep
    }
    val byName: Seq[(String, Seq[Double])] =
      names.map(n => n -> draws.map(_.find(_._1 == n).get._2))
    // Median per query; any failed draw poisons the query to -1.0.
    val results: Seq[(String, Double)] = byName.map { case (n, ds) =>
      n -> (if (ds.exists(_ < 0)) -1.0 else median(ds))
    }

    // Full-resolution artifact (medians + raw draws) for the repo.
    val fmt3 = (v: Double) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    locally {
      val meds = results.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }.mkString("{", ",", "}")
      val raw = byName.map { case (k, ds) =>
        "\"" + k + "\":[" + ds.map(fmt3).mkString(",") + "]"
      }.mkString("{", ",", "}")
      val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val total = results.map { case (_, v) => if (v < 0) FailPenaltySec else v }.sum
      val json = s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","runs":$runs,""" +
        s""""sf":"$sfDir","sink":"$sink","queries":$meds,"failed":$failed,"draws":$raw}"""
      val p = java.nio.file.Paths.get(rawOut)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      println(s"# raw draws written to $rawOut")
    }

    // `q01_agg_pricing_summary` -> `q01`: unique by construction (asserted).
    val shortKey = results.map { case (n, _) => n -> n.takeWhile(_ != '_') }.toMap
    require(shortKey.values.toSet.size == results.size, "short bench keys collide")

    def line(keyOf: String => String, fmt: Double => String): String = {
      val qs = results.map { case (k, v) => "\"" + keyOf(k) + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val failed = results.collect { case (k, v) if v < 0 => "\"" + keyOf(k) + "\"" }
        .mkString("[", ",", "]")
      val total = results.map { case (_, v) => if (v < 0) FailPenaltySec else v }.sum
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":$runs,"queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    }
    println(line(identity, _.toString))            // full names, for humans
    // Locale.ROOT: a comma-decimal default locale must not break the JSON
    println(line(shortKey, fmt3))                  // compact, for tools/humans
    // The harness that captures this process keeps only the LAST ~2000
    // bytes of stdout and parses the LAST JSON line from it. Round 12's
    // final line was a total-only JSON (it always fit), but that left the
    // driver's artifact with NO per-query medians (PERF_r12.per_query was
    // empty and now_bench_ok=false — the per-query dict lines above were
    // head-truncated). Fixed this round, timing methodology unchanged: the
    // FINAL line is a COMPLETE JSON with the full "queries" map, rendered
    // at the highest uniform precision ladder that keeps the whole line
    // within the capture window. Worst case (nothing fits) falls back to
    // the old total-only line rather than emitting a truncated head.
    val total = results.map { case (_, v) => if (v < 0) FailPenaltySec else v }.sum
    val nFailed = results.count(_._2 < 0)
    val tailBudget = 1950 // capture window is 2000 bytes (BENCH_r11/12 tails)
    // %.{dp}f with trailing zeros (and a bare trailing '.') trimmed —
    // "0.70" -> "0.7", "4.00" -> "4"; still valid JSON numbers.
    def trim(v: Double, dp: Int): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
      if (!s.contains('.')) s
      else s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    }
    // Precision ladders, most precise first: (below1, below10, above10) dp.
    val ladders = Seq((3, 3, 3), (3, 2, 1), (2, 2, 1), (2, 1, 1), (1, 1, 1))
    def finalLine(ladder: (Int, Int, Int)): String = {
      val (d1, d10, dBig) = ladder
      val fmtA = (v: Double) =>
        if (v < 0) "-1"
        else trim(v, if (v < 1) d1 else if (v < 10) d10 else dBig)
      val qs = results.map { case (k, v) => "\"" + shortKey(k) + "\":" + fmtA(v) }
        .mkString("{", ",", "}")
      val failed = if (nFailed == 0) ""
        else results.collect { case (k, v) if v < 0 => "\"" + shortKey(k) + "\"" }
          .mkString(""","failed":[""", ",", "]")
      s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","runs":$runs,""" +
        s""""n":${results.size},"n_failed":$nFailed,"sf":"$sfDir","queries":$qs$failed}"""
    }
    val fitting = ladders.iterator.map(finalLine).find(_.length <= tailBudget)
    println(fitting.getOrElse(
      s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","runs":$runs,"n":${results.size},"n_failed":$nFailed,"sf":"$sfDir"}"""))
    spark.stop()
  }
}
