package graft

import graft.unified.EntityStore
import graft.unified.EntityStore.EntityRow
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the unified write path end-to-end: create/update/delete
  * entities, connect edges, then run the flagship cross-model query over
  * the live store (mirrors the reference scenario in FIXTURES.md §3).
  */
class EntityStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def freshStore(): EntityStore = {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString
    new EntityStore(spark, dir)
  }

  private def vec(seed: Int): Array[Float] = {
    // deterministic unit-ish vectors; neighbors in seed are similar
    (0 until 8).map(i => math.sin(seed * 0.7 + i).toFloat).toArray
  }

  test("put / update / delete with latest-wins reads") {
    val st = freshStore()
    st.put(Seq(EntityRow("user:alice", Map("team" -> "ml"), Some(vec(1)))))
    st.put(Seq(EntityRow("user:bob", Map("team" -> "infra"), Some(vec(2)))))
    assert(st.entities.count() == 2)
    st.put(Seq(EntityRow("user:alice", Map("team" -> "platform"), Some(vec(1)))))
    val alice = st.entities.filter("key = 'user:alice'").collect()(0)
    assert(alice.getAs[Map[String, String]]("props")("team") == "platform")
    assert(st.entities.count() == 2)
    st.delete(Seq("user:bob"))
    assert(st.entities.count() == 1)
  }

  test("connect / disconnect and neighbors") {
    val st = freshStore()
    st.put((1 to 5).map(i => EntityRow(s"user:$i", Map("i" -> i.toString), Some(vec(i)))))
    st.connect("user:1", "user:2", "knows")
    st.connect("user:1", "user:3", "knows")
    st.connect("user:4", "user:1", "mentors")
    assert(st.neighbors("user:1").count() == 3)
    st.disconnect("user:1", "user:3", "knows")
    assert(st.neighbors("user:1").count() == 2)
  }

  test("flagship SIMILAR CONNECTED TO over the live store") {
    val st = freshStore()
    st.put((1 to 10).map(i => EntityRow(s"user:$i", Map.empty, Some(vec(i)))))
    // hub user:1 connected to 2,3,4
    Seq(2, 3, 4).foreach(i => st.connect("user:1", s"user:$i", "knows"))
    val sim = st.similar("user:2", 5).collect().map(_.getString(0))
    assert(sim.length == 5 && !sim.contains("user:2"))
    val connected = st.similarConnectedTo("user:2", "user:1", 3).collect().map(_.getString(0))
    // results must be drawn from user:1's neighborhood (minus the hub itself)
    assert(connected.nonEmpty && connected.toSet.subsetOf(Set("user:3", "user:4", "user:2")))
    // compaction preserves the view
    val before = st.entities.orderBy("key").collect().map(_.getString(0)).toSeq
    st.compact()
    val after = st.entities.orderBy("key").collect().map(_.getString(0)).toSeq
    assert(before == after)
  }

  test("compaction keeps tombstones (deletes must keep masking base rows)") {
    val st = freshStore()
    st.put(Seq(EntityRow("user:1", Map.empty, None)))
    st.delete(Seq("user:1"))
    st.delete(Seq("ghost:1")) // tombstone for a key that only exists in base
    st.connect("a", "b", "t")
    st.disconnect("a", "b", "t")
    assert(st.deletedKeys.collect().map(_.getString(0)).toSet == Set("user:1", "ghost:1"))
    st.compact()
    assert(st.entities.count() == 0 && st.edges.count() == 0)
    assert(st.deletedKeys.collect().map(_.getString(0)).toSet == Set("user:1", "ghost:1"),
      "compaction dropped tombstones — base-row masking would be lost")
    assert(st.deletedEdges.count() == 1)
  }
}
