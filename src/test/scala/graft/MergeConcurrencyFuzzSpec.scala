package graft

import graft.nql.Nql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-threaded fuzz of the merge-statement write surface (round 12,
  * VERDICT r11 item 6 — WriteFuzzSpec is single-threaded). Each seeded
  * schedule races 2-4 threads of random read-merge-append statements
  * (ENTITY UPDATE and Cypher MATCH…SET, the two merge families) on a
  * small contended key space, then checks against the latest-wins model:
  *
  *  - ZERO LOST UPDATES: every thread writes thread-unique props, so any
  *    interleaving of read-merge-append that drops a concurrent merge's
  *    assignment leaves a missing/stale prop — each key's final view
  *    must carry every thread's LAST value for its own prop (a
  *    thread's ops are sequential, so that value is deterministic no
  *    matter how the threads interleave).
  *  - DETERMINISTIC INTERLEAVING LOG: the store's append log is the
  *    schedule's serialization — every append carries a unique monotone
  *    `seq`, recoverable post-hoc from the raw parquet.
  *  - MODEL PARITY: the read path's latest-wins view must equal the
  *    model fold of the raw log in seq order.
  *
  * 50+ seeded schedules; the root seed pins the statement mix while the
  * OS scheduler supplies genuinely nondeterministic interleavings —
  * every assertion above is interleaving-independent by construction.
  */
class MergeConcurrencyFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private case class Op(tid: Int, i: Int, key: String, prop: String, value: String,
    cypher: Boolean)

  test("50 seeded 2-4 thread merge schedules: zero lost updates, log + model parity") {
    val root = new scala.util.Random(0xC0FFEE)
    for (sched <- 1 to 50) {
      val rnd = new scala.util.Random(root.nextLong())
      val dir = java.nio.file.Files.createTempDirectory(s"es-mfz$sched").toString
      val store = new graft.unified.EntityStore(spark, dir)
      def runS(q: String) = Nql.execute(spark, sf, store, q)

      val nThreads = 2 + rnd.nextInt(3) // 2-4
      val keys = (0 until 1 + rnd.nextInt(2)).map(i => s"fz:$sched:$i") // 1-2 contended keys
      keys.foreach(k => runS(s"ENTITY CREATE '$k' {label: 'fz', name: 'base'}"))

      val ops = for (t <- 0 until nThreads; i <- 0 until 2 + rnd.nextInt(2)) yield
        Op(t, i, keys(rnd.nextInt(keys.size)), s"p_t$t", s"s$sched.t$t.i$i",
          cypher = rnd.nextBoolean())
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = ops.groupBy(_.tid).values.map { os =>
        new Thread(() =>
          try os.sortBy(_.i).foreach { op =>
            if (op.cypher)
              runS(s"MATCH (x:fz {key: '${op.key}'}) SET x.${op.prop} = '${op.value}'").collect()
            else
              runS(s"ENTITY UPDATE '${op.key}' SET ${op.prop} = '${op.value}', shared = '${op.value}'")
          } catch { case t: Throwable => failures.add(t) })
      }.toSeq
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(failures.isEmpty, s"schedule $sched threw: ${failures.peek()}")

      // deterministic interleaving log: raw append log, unique monotone seq
      val log = spark.read.parquet(s"$dir/entities")
        .select("key", "props", "deleted", "seq")
        .collect().sortBy(_.getAs[Long]("seq"))
      val seqs = log.map(_.getAs[Long]("seq"))
      assert(seqs.distinct.length == seqs.length, s"schedule $sched: seq collision")

      // model: latest-wins fold of the log in seq order
      val model = log.foldLeft(Map.empty[String, Map[String, String]]) { (m, r) =>
        if (r.getAs[Boolean]("deleted")) m - r.getAs[String]("key")
        else m + (r.getAs[String]("key") -> r.getAs[Map[String, String]]("props"))
      }
      val actual = store.entities.select("key", "props").collect()
        .map(r => r.getAs[String]("key") -> r.getAs[Map[String, String]]("props")).toMap
      assert(actual == model, s"schedule $sched: read path diverged from log fold")

      // zero lost updates: each thread's last value for its own prop survives
      for ((op, last) <- ops.groupBy(o => (o.key, o.prop)).map { case (_, os) =>
          val l = os.maxBy(_.i); (l, l.value) }) {
        val got = actual.get(op.key).flatMap(_.get(op.prop))
        assert(got.contains(last),
          s"schedule $sched: lost update on ${op.key}.${op.prop}: got $got want $last")
      }
      // untouched prop survives every merge
      keys.foreach { k =>
        assert(actual.get(k).flatMap(_.get("name")).contains("base"),
          s"schedule $sched: merge dropped an untouched prop on $k")
      }
    }
  }
}
