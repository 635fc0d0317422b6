package graft

import graft.nql.Nql
import org.scalatest.funsuite.AnyFunSuite

/** DDL + DML (SURVEY §2.1/§2.2: CREATE TABLE, INSERT, INSERT..SELECT,
  * DROP, SHOW/DESCRIBE) through the NQL front door — Catalyst executes
  * them natively, superseding the reference's narrowed 6-type DDL.
  */
class DdlDmlSpec extends AnyFunSuite {
  import TestSpark._

  test("create / insert / insert-select / describe / drop") {
    val loc = java.nio.file.Files.createTempDirectory("graft-ddl").toString
    def nql(q: String) = Nql.execute(spark, sf, q)

    nql(s"CREATE TABLE graft_users (name STRING, age INT, email STRING) USING parquet LOCATION '$loc/users'")
    nql("INSERT INTO graft_users VALUES ('alice', 34, 'a@x.io'), ('bob', 28, NULL), ('carol', 41, 'c@x.io')")
    assert(nql("SELECT count(*) AS n FROM graft_users").collect()(0).getLong(0) == 3)
    // reference null semantics note: SQL 3VL — email = NULL matches nothing
    assert(nql("SELECT * FROM graft_users WHERE email IS NULL").count() == 1)

    nql(s"CREATE TABLE graft_adults USING parquet LOCATION '$loc/adults' AS SELECT name, age FROM graft_users WHERE age >= 30")
    assert(nql("SELECT name FROM graft_adults ORDER BY name").collect().map(_.getString(0)).toSeq == Seq("alice", "carol"))

    val described = nql("DESCRIBE graft_users").collect().map(_.getString(0)).toSeq
    assert(described.contains("name") && described.contains("age"))
    assert(nql("SHOW TABLES").count() >= 2)

    nql("DROP TABLE graft_adults")
    nql("DROP TABLE graft_users")
    assert(!spark.catalog.tableExists("graft_users"))
  }

  test("UPDATE / DELETE execute via copy-on-write rewrite") {
    val loc = java.nio.file.Files.createTempDirectory("graft-dml").toString
    def nql(q: String) = Nql.execute(spark, sf, q)

    nql(s"CREATE TABLE graft_dml (name STRING, age INT, team STRING) USING parquet LOCATION '$loc/t'")
    nql("INSERT INTO graft_dml VALUES ('alice', 34, 'ml'), ('bob', 28, 'infra'), ('carol', 41, 'ml'), ('dan', 19, NULL)")

    // UPDATE: expression RHS evaluated against the OLD row, WHERE-scoped
    val u = nql("UPDATE graft_dml SET age = age + 1 WHERE team = 'ml'").collect()(0)
    assert(u.getAs[String]("operation") == "update" && u.getAs[Long]("rows_affected") == 2)
    assert(nql("SELECT age FROM graft_dml WHERE name = 'alice'").collect()(0).getInt(0) == 35)
    assert(nql("SELECT age FROM graft_dml WHERE name = 'bob'").collect()(0).getInt(0) == 28)

    // multi-column SET all read old values: swap semantics
    nql("UPDATE graft_dml SET name = team, team = name WHERE name = 'bob'")
    assert(nql("SELECT team FROM graft_dml WHERE name = 'infra'").collect()(0).getString(0) == "bob")

    // DELETE: NULL predicate rows survive (3VL, like SQL DELETE)
    val dl = nql("DELETE FROM graft_dml WHERE team = 'ml'").collect()(0)
    assert(dl.getAs[Long]("rows_affected") == 2)
    assert(nql("SELECT name FROM graft_dml ORDER BY name").collect().map(_.getString(0)).toSeq
      == Seq("dan", "infra"))

    // unconditional DELETE empties the table, schema preserved
    nql("DELETE FROM graft_dml")
    assert(nql("SELECT count(*) AS n FROM graft_dml").collect()(0).getLong(0) == 0)
    nql("DROP TABLE graft_dml")

    // DML against the read-only sf views fails loudly with CTAS guidance
    val ex = intercept[graft.nql.NqlExecException](nql("DELETE FROM lineitem WHERE l_orderkey = 1"))
    assert(ex.getMessage.contains("CREATE TABLE"))
  }

  test("partitioned UPDATE/DELETE rewrite only the touched partitions") {
    val loc = java.nio.file.Files.createTempDirectory("graft-pdml").toString
    def nql(q: String) = Nql.execute(spark, sf, q)
    def partFiles(team: String): Set[String] = {
      val d = new java.io.File(s"$loc/t/team=$team")
      if (!d.exists) Set.empty
      else d.listFiles.filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }

    nql(s"CREATE TABLE graft_pdml (name STRING, age INT, team STRING) USING parquet PARTITIONED BY (team) LOCATION '$loc/t'")
    nql("INSERT INTO graft_pdml VALUES ('alice', 34, 'ml'), ('bob', 28, 'infra'), ('carol', 41, 'ml'), ('dan', 19, 'web')")
    val infraBefore = partFiles("infra")
    val webBefore = partFiles("web")
    assert(infraBefore.nonEmpty && webBefore.nonEmpty)

    // UPDATE hitting only team='ml': infra/web partition FILES untouched
    val u = nql("UPDATE graft_pdml SET age = age + 1 WHERE team = 'ml'").collect()(0)
    assert(u.getAs[Long]("rows_affected") == 2)
    assert(partFiles("infra") == infraBefore, "untouched partition was rewritten")
    assert(partFiles("web") == webBefore, "untouched partition was rewritten")
    assert(nql("SELECT sum(age) AS s FROM graft_pdml WHERE team = 'ml'")
      .collect()(0).getLong(0) == 35 + 42)

    // zero-hit DML writes nothing anywhere
    val mlBefore = partFiles("ml")
    assert(nql("UPDATE graft_pdml SET age = 0 WHERE team = 'absent'")
      .collect()(0).getAs[Long]("rows_affected") == 0)
    assert(partFiles("ml") == mlBefore && partFiles("infra") == infraBefore)

    // DELETE emptying a whole partition drops it; others untouched
    val d = nql("DELETE FROM graft_pdml WHERE team = 'web'").collect()(0)
    assert(d.getAs[Long]("rows_affected") == 1)
    assert(partFiles("infra") == infraBefore)
    assert(nql("SELECT count(*) AS n FROM graft_pdml WHERE team = 'web'")
      .collect()(0).getLong(0) == 0)
    assert(nql("SELECT count(*) AS n FROM graft_pdml").collect()(0).getLong(0) == 3)

    // partial delete inside one partition keeps the others' files
    nql("DELETE FROM graft_pdml WHERE name = 'carol'")
    assert(partFiles("infra") == infraBefore)
    assert(nql("SELECT name FROM graft_pdml ORDER BY name").collect().map(_.getString(0)).toSeq
      == Seq("alice", "bob"))

    // SET on the partition column migrates the row between partitions
    nql("UPDATE graft_pdml SET team = 'ml' WHERE name = 'bob'")
    assert(nql("SELECT team FROM graft_pdml WHERE name = 'bob'").collect()(0).getString(0) == "ml")
    assert(nql("SELECT count(*) AS n FROM graft_pdml WHERE team = 'infra'")
      .collect()(0).getLong(0) == 0)

    // unconditional DELETE truncates (partition metadata cleared too)
    nql("DELETE FROM graft_pdml")
    assert(nql("SELECT count(*) AS n FROM graft_pdml").collect()(0).getLong(0) == 0)
    nql("DROP TABLE graft_pdml")
  }
}
