package graft

import org.apache.spark.sql.SparkSession

/** One place for the session configuration every graft entry point needs.
  *
  * `spark.sql.legacy.parquet.nanosAsLong` lives here — at session
  * construction — rather than as a side effect of reading the events table
  * (events.parquet is TIMESTAMP(NANOS), which Spark 4 otherwise rejects
  * with [PARQUET_TYPE_ILLEGAL]). Setting it per-session keeps `Tables`
  * side-effect-free: no user read inherits legacy behavior it didn't ask
  * for, and a session that skips this builder fails loudly on the events
  * read instead of silently changing semantics.
  */
object GraftSession {

  /** Standard local builder: `cpus` threads, shuffle partitions sized to
    * the machine (not Spark's default 200), AQE on, UTC, UI off.
    */
  def localBuilder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ContextCleaner frees localCheckpoint/cache blocks only after a
      // DRIVER GC discovers the RDD unreferenced; the default periodic GC
      // (30 min) is longer than a whole bench/verify run, so dead blocks
      // from completed queries pile up in the block manager and grind
      // late queries into GC thrash. One driver GC a minute bounds that.
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false")

  def local(cpus: String): SparkSession = {
    val s = localBuilder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
