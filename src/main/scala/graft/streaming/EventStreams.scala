package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` table. The reference
  * has no event-time streaming at all (SURVEY.md §2.13 — "stream" there
  * means pull cursors and WAL appends), so this module is the Spark-native
  * extension: the same transformations run identically over a bounded
  * DataFrame (batch, used by the correctness gate) and over `readStream`
  * input with watermarks (tested via MemoryStream in EventStreamsSpec).
  */
object EventStreams {

  /** Tumbling 6-hour windows per event type: count + value sum.
    * Works on batch or streaming input alike; on streaming input add
    * `.withWatermark("ts", ...)` upstream for state eviction.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))

  /** Watermarked streaming variant (10-minute allowed lateness). */
  def tumblingCountsStream(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "10 minutes"))

  /** Sliding 6-hour windows every 3 hours: each event lands in exactly two
    * windows. Same batch/stream duality as [[tumblingCounts]].
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))

  /** Watermarked streaming variant of [[slidingCounts]]. */
  def slidingCountsStream(events: DataFrame): DataFrame =
    slidingCounts(events.withWatermark("ts", "10 minutes"))

  /** First event per (user_id, event_type) — the batch form of streaming
    * dedup state, with a deterministic "first" = min (ts, event_id).
    */
  def dedupFirstPerKey(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "event_type").orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id")
  }

  /** Streaming dedup via dropDuplicates — keeps the first ARRIVAL per
    * key, which equals [[dedupFirstPerKey]] when the source is event-time
    * ordered (asserted in the spec). NOTE on state: because the key set
    * omits the event-time column, Spark keeps ONE state row per distinct
    * key forever — bounded by key cardinality, not by the watermark.
    * For unbounded key spaces use [[dedupStreamWithinWatermark]].
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
      .select("user_id", "event_type", "event_id")

  /** Watermark-BOUNDED dedup state: duplicates are only suppressed while
    * the key is younger than the watermark delay (the
    * dropDuplicatesWithinWatermark contract) — the right form when the
    * key space is unbounded, e.g. deduping document ids on an ingest
    * stream at corpus scale. Streaming-only by Spark's API (the batch
    * analogue is [[dedupFirstPerKey]]), so this is the one operator here
    * without batch/stream duality.
    */
  def dedupStreamWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type", "event_id")

  /** Gap-based session windows via the native `session_window` function
    * (30-minute inactivity gap): per-user sessions with event count and
    * an exactly-summed value total. The value sum is quantized to 1e-4
    * longs before summing so the aggregate is order-independent — a raw
    * double sum's low bits depend on partition merge order. On streaming
    * input (see [[sessionWindowStream]]) Spark maintains per-key session
    * state and merges windows as events arrive; state is evicted by the
    * watermark. Batch and stream share this one plan.
    */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 1e4, 0).cast("long")) / 1e4).as("total_value"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("n_events"), col("total_value"))

  /** Watermarked streaming variant of [[sessionWindowCounts]]. */
  def sessionWindowStream(events: DataFrame): DataFrame =
    sessionWindowCounts(events.withWatermark("ts", "10 minutes"))

  /** Purchases joined to same-user clicks in the preceding hour. Written
    * once as a declarative interval join: on bounded inputs Catalyst runs
    * it as an ordinary join; on `readStream` inputs (with watermarks, see
    * [[purchaseClickJoinStream]]) it becomes Spark's symmetric
    * stream-stream join whose per-side state is bounded by the watermark
    * plus the 1 h band.
    */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = clicks.select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, col("user_id") === col("c_user") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") && col("c_ts") <= col("p_ts"))
  }

  /** Watermarked stream-stream variant of [[purchaseClickJoin]]. */
  def purchaseClickJoinStream(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchaseClickJoin(purchases.withWatermark("ts", "10 minutes"),
      clicks.withWatermark("ts", "10 minutes"))

  /** LEFT OUTER interval join: every purchase row survives, trailing-hour
    * same-user clicks attach or stay null. On streams this is the shape
    * whose null rows can only emit once the watermark proves no matching
    * click can still arrive — the capability the inner join (s04) never
    * exercises; [[purchaseClickLeftStream]] runs it with the required
    * two-sided watermark + event-time range condition. */
  def purchaseClickLeft(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
    val c = clicks.select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, col("user_id") === col("c_user") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") && col("c_ts") <= col("p_ts"),
      "left_outer")
  }

  /** Watermarked streaming form of [[purchaseClickLeft]] (append mode;
    * unmatched purchases emit with null click columns when the watermark
    * passes their join window). */
  def purchaseClickLeftStream(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchaseClickLeft(purchases.withWatermark("ts", "10 minutes"),
      clicks.withWatermark("ts", "10 minutes"))

  /** Stream-static enrichment join: events (the unbounded side) joined to
    * the customer→nation dimension (static side, explicitly broadcast) —
    * the canonical "enrich a 100 TB event stream with a small dim table"
    * shape. The dim build is two dimension-table scans joined once and
    * shipped to every executor; the event side never shuffles for the
    * join, only for the final (nation, type) aggregate. Value totals are
    * 1e-4-quantized longs so the sum is merge-order-independent (the
    * sessionWindowCounts precedent). On `readStream` input the identical
    * plan runs as Spark's stream-static join (complete-mode aggregate;
    * see EventStreamsSpec), where the static side is re-broadcast per
    * micro-batch.
    */
  def nationEnrichedCounts(events: DataFrame, customer: DataFrame,
                           nation: DataFrame): DataFrame = {
    val dim = broadcast(
      customer.join(nation, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")))
    events.join(dim, col("user_id") === col("c_custkey"))
      .groupBy("n_name", "event_type")
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 1e4, 0).cast("long")) / 1e4).as("total_value"))
  }

  /** Per-user session state for flatMapGroupsWithState. */
  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class SessionOut(user_id: Long, n_events: Int, total_value: Double, duration_s: Long)

  /** Gap-based sessionization (30-min inactivity) as custom streaming
    * state — the KeyValueGroupedDataset.flatMapGroupsWithState path.
    * Emits a session when the gap is exceeded within a batch; remaining
    * state flushes on timeout in a real stream.
    */
  def sessionizeStateful(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var st = state.getOption.orNull
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st == null) st = SessionState(t, t, 1, e.value)
            else if (t - st.last > gapMs) {
              out += SessionOut(user, st.n, st.total, (st.last - st.start) / 1000)
              st = SessionState(t, t, 1, e.value)
            } else st = SessionState(st.start, t, st.n + 1, st.total + e.value)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Streaming count-min-sketch maintenance: the t19 4×1024 grid as a
    * live streaming aggregate over an unbounded document stream — each
    * micro-batch's tokens update at most 4096 counter rows (map-side
    * partial agg collapses everything else), which is exactly why CMS is
    * the streaming-ingest form of heavy-hitter tracking at 100 TB: state
    * is CONSTANT in the corpus. Same md5 row-hashes as the batch grid
    * ([[graft.pipeline.PipelineQueries.cmsBucketExpr]]), so the
    * streaming snapshot equals the batch-built grid on the same corpus
    * (asserted in EventStreamsSpec). Run with Complete output mode (the
    * grid IS the result).
    */
  def cmsGridStream(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .select(col("w"), explode(expr("array(0, 1, 2, 3)")).as("j"))
      .withColumn("bucket", expr(graft.pipeline.PipelineQueries.cmsBucketExpr))
      .groupBy("j", "bucket").agg(count(lit(1)).as("tot"))

  /** Streaming near-exact-dup suppression: each arriving document gets
    * its map-side MinHash signature
    * ([[graft.pipeline.PipelineQueries.withMinhashSignature]] — zero
    * shuffle) and the stream keeps the FIRST document per signature.
    * Docs too short to shingle (empty signature) pass through untouched.
    * State is one row per distinct signature — at 100 TB bound it with
    * `dropDuplicatesWithinWatermark` on an event-time column exactly as
    * s03's dedup does; the spec uses the unbounded form over a finite
    * MemoryStream.
    */
  def minhashDedupStream(docs: DataFrame): DataFrame =
    graft.pipeline.PipelineQueries.withMinhashSignature(docs)
      .filter(col("mh_sig") =!= "")
      .dropDuplicates("mh_sig")

  /** Streaming sessionization with EventTimeTimeout: in addition to the
    * in-batch gap splits above, a session CLOSES AND EMITS when the
    * watermark passes its last event + gap with no new data — the
    * production close-on-inactivity path that [[sessionizeStateful]]'s
    * NoTimeout form cannot express (its open sessions stay in state
    * forever). State per user is O(1) and every emitted session is final
    * (append mode), so the operator runs unbounded: the watermark bounds
    * both state retention and result lateness. MemoryStream-driven in
    * EventStreamsSpec (watermark advanced by a later event on another
    * key, closing the idle user's session via the timeout path).
    */
  def sessionizeStatefulTimeoutStream(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.n, st.total, (st.last - st.start) / 1000))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var st = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (st == null) st = SessionState(t, t, 1, e.value)
              else if (t - st.last > gapMs) {
                out += SessionOut(user, st.n, st.total, (st.last - st.start) / 1000)
                st = SessionState(t, t, 1, e.value)
              } else st = SessionState(st.start, t, st.n + 1, st.total + e.value)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            out.iterator
          }
      }
  }

  /** CDC latest-state per key, batch form: the final upsert view a
    * latest-wins materialization holds once the stream drains — one row
    * per user carrying the most recent event (ties broken by event_id,
    * so the answer is total-order deterministic). One shuffle on the
    * key; `max_by` over a (ts, event_id) struct keeps the agg partial/
    * final-splittable, so the map side reduces each partition to one
    * candidate row per key before the exchange.
    */
  def latestStatePerKey(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(max_by(
        struct(col("ts"), col("event_id"), col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("st"))
      .select(col("user_id"), col("st.ts").as("ts"),
        col("st.event_id").as("event_id"), col("st.event_type").as("event_type"),
        col("st.value").as("value"))

  case class CdcEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String, value: Double)

  /** Streaming form of [[latestStatePerKey]]: keyed `mapGroupsWithState`
    * holds exactly ONE CdcEvent per key (O(1) state — the upsert cell)
    * and emits the key's refreshed state every trigger (update mode).
    * The last emission per key after the stream drains equals the batch
    * form — asserted in EventStreamsSpec. At scale, bound state for
    * keys that go cold with an event-time timeout that flushes and
    * drops them (the sessionizeStatefulTimeoutStream pattern).
    */
  def latestStateStream(events: Dataset[CdcEvent]): Dataset[CdcEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[CdcEvent, CdcEvent](GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[CdcEvent], state: GroupState[CdcEvent]) =>
          val cand = (it ++ state.getOption.iterator)
            .maxBy(e => (e.ts.getTime, e.event_id))
          state.update(cand)
          cand
      }
  }
}
