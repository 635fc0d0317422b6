package graft

import graft.nql.Nql
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-writer contract of the EntityStore merge path (round 10,
  * VERDICT r9 item 8). ENTITY UPDATE is read-merge-append: without
  * mutual exclusion two interleaved updates on one key both read the
  * same pre-image and the later append silently drops the earlier
  * statement's assignment (lost update — documented as a race since
  * r7). The store now serializes merge-statement bodies on a monitor
  * (`EntityStore.withMergeLock`), so within one process lost updates
  * are impossible; the cross-process single-writer contract is
  * documented in COVERAGE.md (the reference engine mutates under
  * `&mut self` — single-threaded — so it has no sharper guarantee).
  */
class EntityStoreConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  test("two interleaved ENTITY UPDATEs on one key: both assignments survive") {
    val store = new graft.unified.EntityStore(spark,
      java.nio.file.Files.createTempDirectory("es-conc").toString)
    def runS(q: String) = Nql.execute(spark, sf, store, q)
    runS("ENTITY CREATE 'e:1' { name: 'base' }")
    // 8 rounds of two racing single-prop merges; every round both props
    // must land. Pre-lock this raced: both threads read the same
    // pre-image and the second append dropped the first's prop.
    for (round <- 1 to 8) {
      val t1 = new Thread(() => runS(s"ENTITY UPDATE 'e:1' SET left = 'L$round'"))
      val t2 = new Thread(() => runS(s"ENTITY UPDATE 'e:1' SET right = 'R$round'"))
      t1.start(); t2.start(); t1.join(); t2.join()
      val props = store.entities.filter(org.apache.spark.sql.functions.col("key") === "e:1")
        .collect()(0).getAs[Map[String, String]]("props")
      assert(props.get("left").contains(s"L$round") && props.get("right").contains(s"R$round"),
        s"round $round lost an update: $props")
      assert(props.get("name").contains("base"), s"merge dropped an untouched prop: $props")
    }
  }

  test("racing ENTITY UPDATE against MATCH ... SET keeps both assignments") {
    val store = new graft.unified.EntityStore(spark,
      java.nio.file.Files.createTempDirectory("es-conc2").toString)
    def runS(q: String) = Nql.execute(spark, sf, store, q)
    runS("ENTITY CREATE 'e:2' { label: 'mix', name: 'base' }")
    for (round <- 1 to 4) {
      val t1 = new Thread(() => runS(s"ENTITY UPDATE 'e:2' SET a = 'A$round'"))
      val t2 = new Thread(() =>
        runS(s"MATCH (x:mix {key: 'e:2'}) SET x.b = 'B$round'").collect())
      t1.start(); t2.start(); t1.join(); t2.join()
      val props = store.entities.filter(org.apache.spark.sql.functions.col("key") === "e:2")
        .collect()(0).getAs[Map[String, String]]("props")
      assert(props.get("a").contains(s"A$round") && props.get("b").contains(s"B$round"),
        s"round $round lost an update across statement families: $props")
    }
  }
}
