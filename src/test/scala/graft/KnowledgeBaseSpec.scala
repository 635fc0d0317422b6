package graft

import graft.nql.Nql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end replay of the reference's knowledge-base sample
  * (`samples/knowledge-base.nql`, FIXTURES.md §2): the relational people
  * table, the org graph, the skill embeddings, and the unified project
  * entities, all driven through the NQL front door in one session, with
  * the sample's own "queries to try" as golden assertions.
  *
  * Dialect mapping (documented divergences from the sample text):
  *  - `TEXT` → `STRING`; PRIMARY KEY / DEFAULT are informational in the
  *    sample (single-writer demo) and dropped here.
  *  - `NODE CREATE person {name: …}` auto-generates ids in the reference;
  *    here nodes carry explicit keys (`person:alice`), which the sample
  *    itself needs for its edge commands ("use NODE LIST to see them").
  *  - `EMBED STORE 'k' [v, …]` → `EMBED STORE 'k' (v, …)`.
  *  - CACHE/VAULT sections are out of scope per SURVEY §2.15.
  */
class KnowledgeBaseSpec extends AnyFunSuite {
  import TestSpark._

  private val people = Seq(
    // (id, name, role, team, joined, level)  — knowledge-base.nql:27-36
    (1, "Alice Chen", "Staff Engineer", "Platform", "2020-03-15", 5),
    (2, "Bob Kim", "Engineering Manager", "Platform", "2019-06-01", 6),
    (3, "Carol Reyes", "Senior Engineer", "ML", "2021-01-10", 4),
    (4, "Dave Park", "Junior Engineer", "Platform", "2023-09-01", 2),
    (5, "Eve Santos", "Staff Engineer", "ML", "2020-07-20", 5),
    (6, "Frank Liu", "Principal Engineer", "Infra", "2018-02-01", 7),
    (7, "Grace Patel", "Engineering Manager", "ML", "2019-11-15", 6),
    (8, "Hiro Tanaka", "Senior Engineer", "Infra", "2021-04-01", 4),
    (9, "Ivy Wong", "Junior Engineer", "ML", "2024-01-15", 1),
    (10, "Jake Adams", "Director of Engineering", "Leadership", "2017-01-01", 8))

  // skill vectors, knowledge-base.nql:96-105
  private val skills: Seq[(String, Seq[Double])] = Seq(
    "alice" -> Seq(0.9, 0.4, 0.1, 0.7, 0.6, 0.3, 0.5, 0.6),
    "bob" -> Seq(0.6, 0.2, 0.1, 0.5, 0.3, 0.2, 0.9, 0.8),
    "carol" -> Seq(0.3, 0.9, 0.1, 0.4, 0.8, 0.1, 0.3, 0.5),
    "dave" -> Seq(0.4, 0.1, 0.2, 0.5, 0.2, 0.1, 0.1, 0.3),
    "eve" -> Seq(0.5, 0.95, 0.05, 0.3, 0.9, 0.2, 0.4, 0.6),
    "frank" -> Seq(0.95, 0.3, 0.05, 0.6, 0.4, 0.8, 0.6, 0.5),
    "grace" -> Seq(0.3, 0.7, 0.1, 0.3, 0.5, 0.1, 0.9, 0.9),
    "hiro" -> Seq(0.8, 0.2, 0.1, 0.6, 0.3, 0.7, 0.2, 0.4),
    "ivy" -> Seq(0.2, 0.5, 0.1, 0.2, 0.6, 0.1, 0.1, 0.4),
    "jake" -> Seq(0.5, 0.3, 0.1, 0.3, 0.3, 0.3, 0.95, 0.95))

  // reporting tree, knowledge-base.nql:64-72
  private val reports = Seq("alice" -> "bob", "dave" -> "bob",
    "carol" -> "grace", "eve" -> "grace", "ivy" -> "grace",
    "bob" -> "jake", "grace" -> "jake", "frank" -> "jake", "hiro" -> "frank")
  private val mentors = Seq("alice" -> "dave", "eve" -> "ivy", "frank" -> "hiro")
  private val collabs = Seq("alice" -> "carol", "eve" -> "frank", "alice" -> "hiro")

  private def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("knowledge-base sample replays end-to-end") {
    val store = new graft.unified.EntityStore(spark,
      java.nio.file.Files.createTempDirectory("kb-store").toString)
    def nql(q: String) = Nql.execute(spark, sf, store, q)

    // ---- 1. relational (knowledge-base.nql:18-41) ----
    nql("DROP TABLE IF EXISTS people")
    nql("CREATE TABLE people (id INT, name STRING, role STRING, team STRING, joined STRING, level INT) USING parquet")
    val values = people.map { case (id, n, r, t, j, l) => s"($id, '$n', '$r', '$t', '$j', $l)" }
    nql(s"INSERT INTO people VALUES ${values.mkString(", ")}")

    val headcount = nql(
      "SELECT team, COUNT(*) AS headcount FROM people GROUP BY team ORDER BY headcount DESC, team")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(headcount == Seq(("ML", 4L), ("Platform", 3L), ("Infra", 2L), ("Leadership", 1L)))

    val seniors = nql(
      "SELECT name, role FROM people WHERE level >= 5 ORDER BY level DESC, name")
      .collect().map(_.getString(0)).toSeq
    assert(seniors == Seq("Jake Adams", "Frank Liu", "Bob Kim", "Grace Patel",
      "Alice Chen", "Eve Santos"))

    // ---- 2. graph (knowledge-base.nql:48-89) ----
    people.foreach { case (id, name, _, _, _, _) =>
      val key = "person:" + name.split(" ")(0).toLowerCase
      nql(s"NODE CREATE '$key' LABEL 'person' NAME '$name'")
      val _ = id
    }
    reports.foreach { case (a, b) => nql(s"EDGE CREATE 'person:$a' TO 'person:$b' TYPE 'reports_to'") }
    mentors.foreach { case (a, b) => nql(s"EDGE CREATE 'person:$a' TO 'person:$b' TYPE 'mentors'") }
    collabs.foreach { case (a, b) => nql(s"EDGE CREATE 'person:$a' TO 'person:$b' TYPE 'collaborates_with'") }

    assert(nql("NODE LIST LABEL 'person'").count() == 10)
    // "who reports to Grace": her reports_to neighborhood is carol/eve/ivy
    // (incoming) plus jake (her own manager, outgoing)
    val aroundGrace = nql("NEIGHBORS 'person:grace' TYPE 'reports_to'")
      .collect().map(_.getString(0)).toSet
    assert(aroundGrace == Set("person:carol", "person:eve", "person:ivy", "person:jake"))
    // Ivy → Director chain (sample's PATH SHORTEST golden, via the
    // overlay-aware FIND PATH form): ivy → grace → jake
    val chain = nql("FIND PATH FROM 'person:ivy' TO 'person:jake'")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(chain == Seq((0, "person:ivy"), (1, "person:grace"), (2, "person:jake")))

    // ---- 3. vector (knowledge-base.nql:96-110) ----
    skills.foreach { case (who, v) =>
      nql(s"EMBED STORE 'person:$who' (${v.mkString(", ")})")
    }
    val got = nql("SIMILAR 'person:alice' LIMIT 5")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // independent expectation: plain Scala cosine over the sample vectors
    val alice = skills.toMap.apply("alice")
    val want = skills.filter(_._1 != "alice")
      .map { case (who, v) =>
        ("person:" + who,
          BigDecimal(cosine(alice, v)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (k, s) => (-s, k) }.take(5)
    assert(got == want)

    // flagship cross-model golden: similar-to-alice ∩ neighbors(bob),
    // checked against the documented 2×-oversample rule computed in Scala
    val gotConn = nql("SIMILAR 'person:alice' CONNECTED TO 'person:bob' LIMIT 5")
      .collect().map(_.getString(0)).toSeq
    val bobNeighbors = (reports ++ mentors ++ collabs)
      .collect { case (a, "bob") => a; case ("bob", b) => b }
      .map("person:" + _).toSet
    val wantConn = skills.filter(_._1 != "alice")
      .map { case (who, v) => ("person:" + who, cosine(alice, v)) }
      .sortBy { case (k, s) => (-s, k) }.take(10) // 2k oversample
      .collect { case (k, _) if bobNeighbors(k) => k }.take(5)
    assert(gotConn == wantConn && gotConn.nonEmpty)

    // ---- 4. unified entities (knowledge-base.nql:119-127) ----
    nql("ENTITY CREATE 'project_atlas' SET name = 'Project Atlas', type = 'project', status = 'active', team = 'Platform' EMBEDDING (0.8, 0.3, 0.2, 0.9, 0.5, 0.4, 0.3, 0.2)")
    nql("ENTITY CREATE 'project_nova' SET name = 'Project Nova', type = 'project', status = 'active', team = 'ML' EMBEDDING (0.2, 0.9, 0.1, 0.4, 0.8, 0.1, 0.2, 0.3)")
    nql("ENTITY CREATE 'project_shield' SET name = 'Project Shield', type = 'project', status = 'planning', team = 'Infra' EMBEDDING (0.7, 0.1, 0.05, 0.5, 0.2, 0.9, 0.4, 0.3)")

    val atlas = nql("ENTITY GET 'project_atlas'").collect()(0)
    val props = atlas.getAs[Map[String, String]]("props")
    assert(props("type") == "project" && props("status") == "active")
    // the sample's FIND NODE WHERE type = 'project' surface: project
    // entities overlay the node view with the default 'entity' label
    assert(nql("FIND NODES entity").count() == 3)
    // SIMILAR 'project_atlas' LIMIT 2 runs over the full store (people
    // skills + projects share the 8-d space, as in the reference demo)
    assert(nql("SIMILAR 'project_atlas' LIMIT 2").count() == 2)

    nql("DROP TABLE people")
  }
}
