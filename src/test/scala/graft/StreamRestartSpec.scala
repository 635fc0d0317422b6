package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpointed-restart recovery: a windowed aggregation driven from a
  * file source must resume from its offset log after a stop/start —
  * already-committed input files are NOT reprocessed, and the state
  * store carries the partial windows across the restart, so the final
  * answer equals the batch aggregate over ALL input. This is the
  * fault-tolerance half of the streaming story the MemoryStream specs
  * (EventStreamsSpec) cannot exercise: MemoryStream has no recoverable
  * offsets, a file source does.
  */
class StreamRestartSpec extends AnyFunSuite {
  import TestSpark._

  test("windowed aggregation resumes from the checkpoint without reprocessing") {
    val base = java.nio.file.Files.createTempDirectory("restart").toString
    val srcDir = s"$base/src"
    val ckpt = s"$base/ckpt"

    val events = Tables(spark, sf, "events")
      .select("ts", "event_type", "value")
    val Array(first, second) = events.randomSplit(Array(0.5, 0.5), seed = 7)
    first.coalesce(1).write.mode("append").parquet(srcDir)

    // foreachBatch upserts window rows into a shared map keyed by
    // (w_start, event_type) — update-mode output, latest row wins.
    val seen = new java.util.concurrent.ConcurrentHashMap[(java.sql.Timestamp, String), (Long, Double)]()
    val filesProcessed = new java.util.concurrent.atomic.AtomicLong(0)
    def start() = spark.readStream.schema(events.schema).parquet(srcDir)
      .transform(df => EventStreams.tumblingCounts(df))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          seen.put((r.getTimestamp(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))
        }
        filesProcessed.incrementAndGet()
        ()
      }
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = seen.size()
    assert(afterFirst > 0)

    // second half lands while the query is DOWN; the restart must pick
    // it up from the offset log and merge into the surviving state
    second.coalesce(1).write.mode("append").parquet(srcDir)
    val batchesBefore = filesProcessed.get()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // restart processed only the new input (offset log, not a rescan):
    // at most 2 more micro-batches (the new file + a possible empty
    // no-data batch), never a full reprocess of batch 1's data
    assert(filesProcessed.get() - batchesBefore <= 2,
      s"restart replayed ${filesProcessed.get() - batchesBefore} batches")

    // and the upserted view equals the batch aggregate over ALL events —
    // only possible if the state store carried batch 1's partial windows
    val batchView = EventStreams.tumblingCounts(events).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val streamed = {
      val it = seen.entrySet().iterator()
      val b = Map.newBuilder[(java.sql.Timestamp, String), (Long, Double)]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    assert(streamed == batchView,
      s"recovered stream state diverged: ${streamed.size} vs ${batchView.size} groups")
  }
}
