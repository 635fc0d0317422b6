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

  test("partition-column SET migration preserves numeric-looking STRING partition values") {
    // The swap path derives adds/stales by reading partition specs back
    // from the staging dir. With partition-type inference ON that read
    // re-types a STRING value that merely looks numeric ('00123' →
    // int 123): the post spec no longer matches the table-typed pre
    // spec, a wrong spec is ADDed, the real post-swap entry is dropped
    // as stale, and the migrated rows silently vanish. The rewrite
    // reads staging with inference OFF and casts to the table's
    // partition schema — pin every lossy-inference shape at once.
    val loc = java.nio.file.Files.createTempDirectory("graft-pinf").toString
    def nql(q: String) = Nql.execute(spark, sf, q)
    nql(s"CREATE TABLE graft_pinf (name STRING, bucket STRING) USING parquet PARTITIONED BY (bucket) LOCATION '$loc/t'")
    // EVERY post-image value must be numeric for inference to strike (a
    // single non-numeric value falls the whole column back to raw
    // strings); trailing-zero decimals are the lossy shape — inference
    // re-types to double and '0.50' renders back as '0.5', so the spec
    // no longer round-trips
    nql("INSERT INTO graft_pinf VALUES ('a', '0.50'), ('b', '0.70')")
    // migrate 'a' into a NEW lossy partition '1.10', emptying '0.50'
    // (a lossy STALE spec) while '0.70' survives untouched
    nql("UPDATE graft_pinf SET bucket = '1.10' WHERE name = 'a'")
    val got = nql("SELECT name, bucket FROM graft_pinf ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq("a" -> "1.10", "b" -> "0.70"),
      s"migrated rows lost or re-typed: $got")
    // partition pruning still works on the preserved literal values
    assert(nql("SELECT count(*) AS n FROM graft_pinf WHERE bucket = '1.10'")
      .collect()(0).getLong(0) == 1)
    assert(nql("SELECT count(*) AS n FROM graft_pinf WHERE bucket = '0.50'")
      .collect()(0).getLong(0) == 0)
    // the catalog's partition set matches what is on disk, in table-typed
    // (raw string) space — no double-rendered '1.1'/'0.7' ghosts, no
    // dropped survivor, the real '1.10' registered
    val specs = spark.sql("SHOW PARTITIONS graft_pinf")
      .collect().map(_.getString(0)).toSet
    assert(specs == Set("bucket=1.10", "bucket=0.70"),
      s"catalog partition set diverged: $specs")
    nql("DROP TABLE graft_pinf")
  }

  test("external partitioned DELETE removes partition files — re-insert cannot resurrect") {
    // LOCATION makes the table EXTERNAL: there DROP PARTITION alone removes
    // only catalog metadata, so without explicit file removal a later
    // INSERT into the same partition value would re-register the partition
    // over the old directory and resurrect the deleted rows.
    val loc = java.nio.file.Files.createTempDirectory("graft-xdml").toString
    def nql(q: String) = Nql.execute(spark, sf, q)
    def partDir(team: String) = new java.io.File(s"$loc/t/team=$team")

    nql(s"CREATE TABLE graft_xdml (name STRING, age INT, team STRING) USING parquet PARTITIONED BY (team) LOCATION '$loc/t'")
    nql("INSERT INTO graft_xdml VALUES ('alice', 34, 'ml'), ('bob', 28, 'infra')")
    assert(partDir("ml").exists)

    // DELETE that empties the ml partition removes its directory on disk
    nql("DELETE FROM graft_xdml WHERE team = 'ml'")
    assert(!partDir("ml").exists, "dropped external partition directory left on disk")
    // re-insert into the same partition value: ONLY the new row is visible
    nql("INSERT INTO graft_xdml VALUES ('carol', 41, 'ml')")
    assert(nql("SELECT name FROM graft_xdml WHERE team = 'ml'")
      .collect().map(_.getString(0)).toSeq == Seq("carol"))

    // unconditional DELETE on the external partitioned table: same guarantee
    nql("DELETE FROM graft_xdml")
    assert(!partDir("ml").exists && !partDir("infra").exists)
    nql("INSERT INTO graft_xdml VALUES ('dan', 19, 'infra')")
    assert(nql("SELECT count(*) AS n FROM graft_xdml").collect()(0).getLong(0) == 1)
    nql("DROP TABLE graft_xdml")
  }

  test("UPDATE writing NULL into a partition column fails loudly before any write") {
    val loc = java.nio.file.Files.createTempDirectory("graft-npdml").toString
    def nql(q: String) = Nql.execute(spark, sf, q)
    nql(s"CREATE TABLE graft_npdml (name STRING, team STRING) USING parquet PARTITIONED BY (team) LOCATION '$loc/t'")
    nql("INSERT INTO graft_npdml VALUES ('alice', 'ml'), ('bob', 'infra')")
    // a SET that nulls the partition column would land rows in
    // __HIVE_DEFAULT_PARTITION__, which later DML rejects — guard up front
    val ex = intercept[graft.nql.NqlExecException](
      nql("UPDATE graft_npdml SET team = NULL WHERE name = 'alice'"))
    assert(ex.getMessage.contains("NULL") && ex.getMessage.contains("team"))
    // nothing was written: table state unchanged
    assert(nql("SELECT team FROM graft_npdml ORDER BY team").collect().map(_.getString(0)).toSeq
      == Seq("infra", "ml"))
    nql("DROP TABLE graft_npdml")
  }

  test("concurrent read during UPDATE: pre-image visible until install, session conf untouched") {
    val loc = java.nio.file.Files.createTempDirectory("graft-cdml").toString
    def nql(q: String) = Nql.execute(spark, sf, q)
    // unpartitioned: install is a two-rename directory swap, so a reader
    // either sees the complete pre-image, the complete post-image, or (in
    // the between-renames instant) a missing-path error — never torn data
    nql(s"CREATE TABLE graft_cdml (id INT) USING parquet LOCATION '$loc/t'")
    nql("INSERT INTO graft_cdml SELECT id FROM range(2000)")
    val preSum = nql("SELECT sum(id) AS s FROM graft_cdml").collect()(0).getLong(0)

    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try observed.add(spark.table("graft_cdml")
          .agg(org.apache.spark.sql.functions.sum("id")).collect()(0).getLong(0))
        catch { case _: Exception => () } // between-renames instant: path absent
      }
    })
    reader.start()
    try nql("UPDATE graft_cdml SET id = id + 10000")
    finally { stop.set(true); reader.join(30000) }

    val postSum = nql("SELECT sum(id) AS s FROM graft_cdml").collect()(0).getLong(0)
    assert(postSum == preSum + 10000L * 2000)
    import scala.jdk.CollectionConverters._
    val bad = observed.asScala.filterNot(v => v == preSum || v == postSum)
    assert(bad.isEmpty, s"reader observed torn state(s): $bad (pre=$preSum post=$postSum)")
    assert(observed.asScala.nonEmpty, "reader thread never completed a read")
    nql("DROP TABLE graft_cdml")

    // partition-MIGRATION path (SET on the partition column): lands via
    // one atomic directory swap, so a concurrent reader sees the complete
    // pre-image, the complete post-image, or a transient error — never a
    // torn or duplicated state (the per-partition overwrite path this
    // replaced exposed migrated rows in BOTH partitions between the
    // overwrite commit and the emptied-partition drop)
    nql(s"CREATE TABLE graft_cdml3 (id INT, team STRING) USING parquet PARTITIONED BY (team) LOCATION '$loc/t3'")
    nql("INSERT INTO graft_cdml3 SELECT CAST(id AS INT), CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(2000)")
    val preSum3 = nql("SELECT sum(id) AS s FROM graft_cdml3").collect()(0).getLong(0)
    val observed3 = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val stop3 = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader3 = new Thread(() => {
      while (!stop3.get()) {
        try observed3.add(spark.table("graft_cdml3")
          .agg(org.apache.spark.sql.functions.sum("id")).collect()(0).getLong(0))
        catch { case _: Exception => () } // swap/catalog-sync instant
      }
    })
    reader3.start()
    // migrate half of 'a' into a NEW partition 'c' and the rest of 'a'
    // into 'b' — exercises added, emptied, and surviving partitions
    try nql("UPDATE graft_cdml3 SET team = CASE WHEN id < 1000 THEN 'c' ELSE 'b' END WHERE team = 'a'")
    finally { stop3.set(true); reader3.join(30000) }
    val postSum3 = nql("SELECT sum(id) AS s FROM graft_cdml3").collect()(0).getLong(0)
    assert(postSum3 == preSum3, "migration must move rows, not change them")
    assert(nql("SELECT count(*) AS n FROM graft_cdml3 WHERE team = 'a'").collect()(0).getLong(0) == 0)
    assert(nql("SELECT count(*) AS n FROM graft_cdml3 WHERE team = 'c'").collect()(0).getLong(0) == 500)
    val bad3 = observed3.asScala.filterNot(_ == preSum3) // pre == post here; anything else is torn/duplicated
    assert(bad3.isEmpty, s"reader observed torn/duplicated state(s) during migration: $bad3 (expected $preSum3)")
    assert(observed3.asScala.nonEmpty, "reader thread never completed a read")
    nql("DROP TABLE graft_cdml3")

    // partitioned path: the dynamic-overwrite mode is a write-scoped
    // option, never a session-conf flip a concurrent query could observe
    val overwriteModeBefore =
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    nql(s"CREATE TABLE graft_cdml2 (id INT, team STRING) USING parquet PARTITIONED BY (team) LOCATION '$loc/t2'")
    nql("INSERT INTO graft_cdml2 VALUES (1, 'a'), (2, 'b')")
    nql("UPDATE graft_cdml2 SET id = id + 1 WHERE team = 'a'")
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      == overwriteModeBefore)
    assert(nql("SELECT sum(id) AS s FROM graft_cdml2").collect()(0).getLong(0) == 4)
    nql("DROP TABLE graft_cdml2")
  }
}
