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
}
