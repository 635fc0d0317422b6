package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming operators through an actual streaming query
  * (MemoryStream source → watermarked windowed agg → memory sink) and
  * checks the result equals the batch run of the same transformation —
  * the batch/streaming-unification contract.
  */
class EventStreamsSpec extends AnyFunSuite {
  import TestSpark._

  test("watermarked tumbling window over a real stream matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables(spark, sf, "events")
      .select("ts", "event_type", "value")
      .orderBy("ts")
      .collect()

    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.tumblingCountsStream(streamDf)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    try {
      mem.addData(events.map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2))).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("w_start", "event_type").collect().toSeq
      val batch = EventStreams.tumblingCounts(Tables(spark, sf, "events"))
        .orderBy("w_start", "event_type").collect().toSeq
      assert(streamed == batch, "streaming result differs from batch result")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup over a real stream matches the batch first-per-key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables(spark, sf, "events")
      .select("ts", "user_id", "event_type", "event_id")
      .orderBy("ts", "event_id") // event-time ordered arrival
      .collect()
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "event_type", "event_id")
    val q = EventStreams.dedupStream(streamDf)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      mem.addData(events.map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("dedup_out")
        .orderBy("user_id", "event_type").collect().toSeq
      val batch = EventStreams.dedupFirstPerKey(Tables(spark, sf, "events"))
        .orderBy("user_id", "event_type").collect().toSeq
      assert(streamed == batch, "streaming dedup differs from batch first-per-key")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming CDC latest-state converges to the batch upsert view") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type", "value")
      .orderBy("ts", "event_id")
      .collect()
      .map(r => EventStreams.CdcEvent(r.getLong(0), r.getTimestamp(1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val mem = MemoryStream[EventStreams.CdcEvent]
    val q = EventStreams.latestStateStream(mem.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_out")
      .start()
    try {
      // two batches: the second must REFRESH keys the first already emitted
      val (first, second) = events.splitAt(events.length / 2)
      mem.addData(first.toSeq); q.processAllAvailable()
      mem.addData(second.toSeq); q.processAllAvailable()
      // last emission per key = the upsert cell's final value
      val streamed = spark.table("cdc_out")
        .withColumn("__n", monotonically_increasing_id())
        .withColumn("__rn", expr(
          "row_number() OVER (PARTITION BY user_id ORDER BY __n DESC)"))
        .filter(col("__rn") === 1).drop("__n", "__rn")
        .orderBy("user_id")
        .collect().toSeq
      val batch = EventStreams.latestStatePerKey(Tables(spark, sf, "events"))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .orderBy("user_id").collect().toSeq
      assert(streamed.map(_.toSeq) == batch.map(_.toSeq),
        "streaming CDC state differs from the batch latest-wins view")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("watermark-bounded dedup emits first-per-key within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Long)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "event_type", "event_id")
    val q = EventStreams.dedupStreamWithinWatermark(streamDf)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out")
      .start()
    try {
      // duplicates inside one watermark window are suppressed
      mem.addData(Seq((at(0), 1L, "click", 10L), (at(1), 1L, "click", 11L), (at(2), 2L, "view", 12L)))
      q.processAllAvailable()
      val rows = spark.table("dedup_wm_out").orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(rows == Seq((1L, "click", 10L), (2L, "view", 12L)))
    } finally q.stop()
  }

  test("stream-stream interval join over real streams matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ev = Tables(spark, sf, "events").select("ts", "user_id", "event_type", "event_id")
    def rowsOf(t: String) = ev.filter(col("event_type") === t)
      .select("event_id", "user_id", "ts").orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSeq
    val memP = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memC = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val pDf = memP.toDF().toDF("event_id", "user_id", "ts")
    val cDf = memC.toDF().toDF("event_id", "user_id", "ts")
    val q = EventStreams.purchaseClickJoinStream(pDf, cDf)
      .select("p_id", "c_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .start()
    try {
      memP.addData(rowsOf("purchase")); memC.addData(rowsOf("click"))
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_out").orderBy("p_id", "c_id").collect().toSeq
      val batch = EventStreams.purchaseClickJoin(
          ev.filter(col("event_type") === "purchase"), ev.filter(col("event_type") === "click"))
        .select("p_id", "c_id").orderBy("p_id", "c_id").collect().toSeq
      assert(streamed == batch, "stream-stream join differs from batch join")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null rows after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)

    val memP = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memC = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventStreams.purchaseClickLeftStream(
        memP.toDF().toDF("event_id", "user_id", "ts"),
        memC.toDF().toDF("event_id", "user_id", "ts"))
      .select("p_id", "c_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("lojoin_out")
      .start()
    try {
      // purchase 1 has a click; purchase 2 has NONE — its null row may
      // only emit once the watermark proves no click can still arrive
      memP.addData(Seq((1L, 10L, at(60)), (2L, 20L, at(61))))
      memC.addData(Seq((100L, 10L, at(30))))
      q.processAllAvailable()
      val early = spark.table("lojoin_out").collect()
      assert(early.forall(r => !r.isNullAt(1)),
        "null row emitted before the watermark closed the join window")
      // advance both watermarks far past purchase 2's window
      memP.addData(Seq((3L, 30L, at(600))))
      memC.addData(Seq((101L, 30L, at(600))))
      q.processAllAvailable()
      // one more no-op batch lets the new watermark flush pending state
      memP.addData(Seq((4L, 40L, at(601))))
      memC.addData(Seq((102L, 40L, at(601))))
      q.processAllAvailable()
      val rows = spark.table("lojoin_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(rows(1L) == 100L, "matched purchase lost its click")
      assert(rows(2L) == -1L, "unmatched purchase never emitted its null row")
    } finally q.stop()
  }

  test("interval joins drop rows arriving beyond the watermark (s04/s08 chaos margin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)

    // ---- inner interval join (the s04 engine) ----
    val memP = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memC = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = EventStreams.purchaseClickJoinStream(
        memP.toDF().toDF("event_id", "user_id", "ts"),
        memC.toDF().toDF("event_id", "user_id", "ts"))
      .select("p_id", "c_id")
      .writeStream.outputMode("append").format("memory").queryName("late_join_out")
      .start()
    try {
      // an in-time pair, then advance both watermarks ~9 hours
      memP.addData(Seq((1L, 10L, at(60))))
      memC.addData(Seq((100L, 10L, at(59))))
      q.processAllAvailable()
      memP.addData(Seq((2L, 99L, at(600))))
      memC.addData(Seq((200L, 99L, at(600))))
      q.processAllAvailable()
      // a click that WOULD match purchase 1, arriving far beyond the
      // watermark (now ≈ t+590): must be dropped, not joined
      memC.addData(Seq((101L, 10L, at(58))))
      q.processAllAvailable()
      val streamed = spark.table("late_join_out").orderBy("p_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(!streamed.contains((1L, 101L)), "too-late click joined after the watermark")
      // stream result == batch twin over the ON-TIME rows only
      val pB = Seq((1L, 10L, at(60)), (2L, 99L, at(600))).toDF("event_id", "user_id", "ts")
      val cOnTime = Seq((100L, 10L, at(59)), (200L, 99L, at(600))).toDF("event_id", "user_id", "ts")
      val batchOnTime = EventStreams.purchaseClickJoin(pB, cOnTime)
        .select("p_id", "c_id").orderBy("p_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(streamed == batchOnTime)
      // …while the batch twin WITH the late row does contain the pair —
      // i.e. only the watermark excluded it, not the join predicate
      val cAll = cOnTime.union(Seq((101L, 10L, at(58))).toDF("event_id", "user_id", "ts"))
      val batchAll = EventStreams.purchaseClickJoin(pB, cAll)
        .select("p_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batchAll.contains((1L, 101L)))
    } finally q.stop()

    // ---- left-outer interval join (the s08 engine): a late click must
    // not retro-fill a null row the watermark already emitted ----
    val memP2 = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memC2 = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q2 = EventStreams.purchaseClickLeftStream(
        memP2.toDF().toDF("event_id", "user_id", "ts"),
        memC2.toDF().toDF("event_id", "user_id", "ts"))
      .select("p_id", "c_id")
      .writeStream.outputMode("append").format("memory").queryName("late_lojoin_out")
      .start()
    try {
      memP2.addData(Seq((1L, 10L, at(60)))) // will have NO in-time click
      memC2.addData(Seq((100L, 77L, at(60)))) // other user, advances watermark
      q2.processAllAvailable()
      // advance watermarks so purchase 1's null row flushes
      memP2.addData(Seq((2L, 99L, at(600)))); memC2.addData(Seq((200L, 99L, at(600))))
      q2.processAllAvailable()
      memP2.addData(Seq((3L, 98L, at(601)))); memC2.addData(Seq((201L, 98L, at(601))))
      q2.processAllAvailable()
      val before = spark.table("late_lojoin_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      assert(before.contains((1L, -1L)), "unmatched purchase never emitted its null row")
      // too-late matching click: dropped; the emitted rows for p1 stay
      // exactly the one null row
      memC2.addData(Seq((102L, 10L, at(59))))
      q2.processAllAvailable()
      val after = spark.table("late_lojoin_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      assert(after.filter(_._1 == 1L) == Seq((1L, -1L)),
        s"late click changed purchase 1's emission: ${after.filter(_._1 == 1L)}")
    } finally q2.stop()
  }

  test("stateful sessionization emits gap-separated sessions") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    // user 1: two sessions (gap 45 min); user 2: one session
    val events = Seq(
      EventStreams.SessionEvent(1L, at(0), 1.0),
      EventStreams.SessionEvent(1L, at(10), 2.0),
      EventStreams.SessionEvent(1L, at(55), 3.0),
      EventStreams.SessionEvent(2L, at(5), 4.0)).toDS()
    val out = EventStreams.sessionizeStateful(events).collect()
    // only completed sessions emit inside the batch (the open ones stay in state)
    assert(out.toSet == Set(EventStreams.SessionOut(1L, 2, 3.0, 600)))
  }

  test("stateful sessionization closes idle sessions via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(base.getTime + min * 60000)
    val mem = MemoryStream[EventStreams.SessionEvent]
    val q = EventStreams.sessionizeStatefulTimeoutStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("session_timeout_out")
      .start()
    try {
      // batch 1: user 1's session (2 events, 5 min apart) — stays open
      mem.addData(
        EventStreams.SessionEvent(1L, at(0), 1.0),
        EventStreams.SessionEvent(1L, at(5), 2.0))
      q.processAllAvailable()
      assert(spark.table("session_timeout_out").count() == 0,
        "session must stay open while the watermark is behind last+gap")
      // batch 2: user 2 far in the future advances the watermark past
      // user 1's last+30min -> user 1's session closes via TIMEOUT
      // (user 1 has no new data, so only the hasTimedOut path can emit)
      mem.addData(EventStreams.SessionEvent(2L, at(180), 9.0))
      q.processAllAvailable()
      val out = spark.table("session_timeout_out")
        .as[EventStreams.SessionOut].collect().toSet
      assert(out == Set(EventStreams.SessionOut(1L, 2, 3.0, 300)))
    } finally q.stop()
  }

  test("streaming CMS grid snapshot equals the batch-built grid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val texts = Tables(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val mem = MemoryStream[String]
    val q = EventStreams.cmsGridStream(mem.toDF().toDF("text"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_grid_out")
      .start()
    try {
      val (h1, h2) = texts.splitAt(texts.length / 2)
      mem.addData(h1); q.processAllAvailable()
      mem.addData(h2); q.processAllAvailable()
      val streamed = spark.table("cms_grid_out")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = EventStreams.cmsGridStream(texts.toSeq.toDF("text"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batch, "streaming grid must equal the batch grid")
      assert(streamed.nonEmpty && streamed.keys.map(_._1).toSet == Set(0, 1, 2, 3))
    } finally q.stop()
  }

  test("stream-static enrichment join over a real stream matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables(spark, sf, "events")
      .select("ts", "user_id", "event_type", "value")
      .orderBy("ts")
      .collect()
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val customer = Tables(spark, sf, "customer")
    val nation = Tables(spark, sf, "nation")
    val q = EventStreams.nationEnrichedCounts(streamDf, customer, nation)
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out")
      .start()
    try {
      mem.addData(events.map(r =>
        (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq)
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .orderBy("n_name", "event_type").collect().toSeq
      val batch = EventStreams.nationEnrichedCounts(
          Tables(spark, sf, "events"), customer, nation)
        .orderBy("n_name", "event_type").collect().toSeq
      assert(streamed == batch, "stream-static enrichment differs from batch")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
