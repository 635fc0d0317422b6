package graft

import graft.nql.{CypherParser, NqlParseException, NqlParser}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Parser robustness fuzz (the spirit of the reference's cargo-fuzz
  * `parser_parse` target, SURVEY §5): arbitrary token soup must either
  * parse or throw the TYPED NqlParseException — never an NPE, a match
  * error, a number-format leak, or a hang. Seeded generation keeps every
  * failure reproducible by its iteration index.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val keywords = Seq(
    "SIMILAR", "NEIGHBORS", "PATH", "NODE", "EDGE", "DEGREE", "GRAPH",
    "EMBED", "ENTITY", "FIND", "ASOF", "SAMPLE", "DEDUP", "BLOBS",
    "TRAVERSE", "WALK", "HYBRID", "REBALANCE", "SEMDEDUP", "BPE",
    "HEAVY", "MMR", "CHUNK", "MATCH", "COUNT", "NODES", "EDGES",
    "LABEL", "TYPE", "LIMIT", "WHERE", "SET", "TO", "FROM", "BATCH",
    "CREATE", "DELETE", "UPDATE", "AND", "IN", "BY", "KEY", "METRIC",
    "CORES", "TRANSITIVITY", "LOUVAIN", "BETWEENNESS", "AGGREGATE",
    "PROPERTY", "ON", "TOP", "INTO", "EMBEDDING", "OFFSET", "LABELS")
  private val atoms = Seq("'x'", "'nation:0'", "''", "1", "42", "-3",
    "0.5", "(", ")", ",", "=", "<", ">=", "<>", "*", "foo", "a_b.c",
    "{", "}", ":", "[", "]", "->")

  private val tokenGen: Gen[String] = Gen.frequency(
    (3, Gen.oneOf(keywords)), (2, Gen.oneOf(atoms)))
  private val stmtGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, tokenGen).map(_.mkString(" ")))

  private def mustParseOrReject(q: String): Unit =
    try { NqlParser.parse(q); () } catch {
      case _: NqlParseException => () // the typed rejection path
      case e: Throwable =>
        fail(s"parser leaked ${e.getClass.getSimpleName} on input <$q>: ${e.getMessage}")
    }

  test("random keyword soup parses or raises NqlParseException only") {
    (1 to 500).foreach { k =>
      val q = stmtGen.apply(Gen.Parameters.default, Seed(k.toLong)).get
      mustParseOrReject(q)
    }
  }

  test("random character noise parses or raises NqlParseException only") {
    val noise = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))
    (1 to 500).foreach { k =>
      val q = noise.apply(Gen.Parameters.default, Seed(1000L + k)).get
      mustParseOrReject(q)
    }
  }

  test("truncations of every valid statement shape reject cleanly") {
    val valid = Seq(
      "SIMILAR 'vec:0' METRIC COSINE CONNECTED TO 'vec:1' WHERE a = 1 LIMIT 5",
      "GRAPH AGGREGATE SUM 'acctbal' NODES LABEL 'customer' WHERE value > 0",
      "ENTITY BATCH CREATE 'k1' SET a = 'b' AND 'k2'",
      "EMBED BATCH 'k' (1.0, 2.0) IN 'c'",
      "NODE BATCH CREATE 'k' LABEL 'l' NAME 'n' AND 'k2'",
      "EDGE BATCH CREATE 'a' TO 'b' TYPE 't' AND 'c' TO 'd'",
      "CHUNK WINDOW 64 STRIDE 48",
      "TRAVERSE FROM 'nation:0' DEPTH 3 TYPE 'in_nation' LABEL 'nation'",
      "MATCH (n:nation)-[:in_region]->(r:region) RETURN n.name ORDER BY n.name LIMIT 3",
      "GRAPH MATCH COUNT (a:customer)-[:in_nation]->(n:nation)",
      "SIMILAR RANGE 'vec:0' THRESHOLD 30 METRIC COSINE",
      "DEDUP AGAINST 'src0'",
      "GRAPH LOUVAIN SWEEPS 2",
      "GRAPH EIGENVECTOR ITERATIONS 4",
      "GRAPH CORES MAX 6",
      "ENTITY UPDATE 'k' SET a = 'b', c = 'd'",
      "EMBED LIST IN 'docs' LIMIT 5",
      "FIND NODES 'nation' WHERE name = 'x' RETURN key, name LIMIT 5",
      "FIND EDGES in_region WHERE dst = 'region:0' RETURN src LIMIT 5",
      "FIND PATH FROM 'customer:7' VIA 'in_nation' TO 'region:2' LIMIT 5",
      "FIND ROWS FROM orders WHERE o_totalprice > 10.0 RETURN o_orderkey LIMIT 5",
      "GRAPH PAGERANK ITERATIONS 5 DAMPING 0.5 TOLERANCE 0.001",
      "GRAPH LOUVAIN SWEEPS 2 RESOLUTION 2.0",
      "GRAPH BETWEENNESS SAMPLE 25",
      "UPDATE t SET a = a + 1, b = 'x' WHERE c < 2",
      "DELETE FROM t WHERE a = 1",
      "SHOW EMBEDDINGS LIMIT 5",
      "SHOW VECTOR INDEX",
      "COUNT EMBEDDINGS",
      "EMBED DELETE 'k'",
      "DESCRIBE NODE person",
      "DESCRIBE EDGE knows",
      "NEIGHBORS 'nation:0' INCOMING TYPE 'in_nation' LIMIT 5",
      "GRAPH PAGERANK DAMPING 0.5 INCOMING EDGE TYPE 'in_nation'",
      "GRAPH BETWEENNESS CENTRALITY SAMPLING 25 BOTH EDGE TYPE 't'",
      "GRAPH CLOSENESS CENTRALITY OUTGOING EDGE TYPE 't'",
      "CONSTRAINT CREATE c1 ON NODE person PROPERTY age TYPE int",
      "CONSTRAINT CREATE c2 ON EDGE PROPERTY etype EXISTS",
      "CONSTRAINT CHECK c1")
    for (q <- valid; cut <- 1 until q.length) mustParseOrReject(q.take(cut))
    // and the full forms must parse
    valid.foreach(q => NqlParser.parse(q))
  }

  test("reference test-corpus sweep: every in-scope statement parses, the rest reject typed") {
    // Statements lifted VERBATIM from the reference parser's own test
    // corpus (`neumann_parser/src/parser.rs` parse_stmt cases and
    // `query_router/src/lib.rs` execute cases). Every statement in the
    // first list must PARSE; every statement in the second must fail
    // with the TYPED NqlParseException (out-of-scope subsystems per
    // COVERAGE.md, or spellings whose semantics genuinely don't map —
    // auto-assigned integer ids, edge properties, edge-id deletes).
    val mustParse = Seq(
      // AGGREGATE statement family (parser.rs:3081-3151)
      "AGGREGATE EDGE PROPERTY weight AVG",
      "AGGREGATE EDGE PROPERTY weight AVG BY TYPE knows",
      "AGGREGATE EDGE PROPERTY weight AVG ON FOLLOWS",
      "AGGREGATE EDGE PROPERTY weight COUNT BY TYPE follows WHERE weight > 0",
      "AGGREGATE EDGE PROPERTY weight SUM",
      "AGGREGATE EDGE PROPERTY weight SUM BY TYPE knows",
      "AGGREGATE NODE PROPERTY age SUM",
      "AGGREGATE NODE PROPERTY age SUM BY LABEL Person",
      "AGGREGATE NODE PROPERTY age SUM ON Person WHERE age > 18",
      "AGGREGATE NODE PROPERTY age SUM WHERE age > 18",
      "AGGREGATE NODE PROPERTY salary AVG",
      // BATCH statement family (parser.rs:2807-3061)
      "BATCH CREATE EDGES []",
      "BATCH CREATE NODES []",
      "BATCH CREATE NODES [{labels: [Person], name: 'Alice'}]",
      "BATCH CREATE NODES [{labels: [person, employee], name: 'Alice', age: 30}]",
      "BATCH DELETE NODES [1, 2, 3]",
      "BATCH UPDATE NODES []",
      "BATCH UPDATE NODES [{id: 1, name: 'Alice Updated'}]",
      "BATCH UPDATE NODES [{id: 1, name: 'Alice'}, {id: 2, name: 'Bob'}]",
      // BLOBS SIMILAR (the one in-scope BLOB statement)
      "BLOBS SIMILAR TO 'artifact123'",
      "BLOBS SIMILAR TO 'artifact123' LIMIT 10",
      "BLOBS SIMILAR TO 'hash123' LIMIT 5",
      // CONSTRAINT family
      "CONSTRAINT CREATE age_int ON NODE PROPERTY age TYPE int",
      "CONSTRAINT CREATE c ON EDGE PROPERTY name UNIQUE",
      "CONSTRAINT CREATE email_unique ON NODE User PROPERTY email UNIQUE",
      "CONSTRAINT CREATE name_required ON NODE PROPERTY name EXISTS",
      "CONSTRAINT CREATE weight_exists ON EDGE knows PROPERTY weight EXISTS",
      "CONSTRAINT DROP email_unique",
      "CONSTRAINT GET my_constraint",
      "CONSTRAINT LIST",
      "COUNT EMBEDDINGS",
      // SQL surface (Catalyst passthrough — parse-level)
      "CREATE TABLE IF NOT EXISTS users (id INT)",
      "CREATE TABLE users (id INT PRIMARY KEY, name VARCHAR(100) NOT NULL)",
      "CREATE TABLE t (age INT CHECK (age > 0))",
      "CREATE INDEX idx_name ON users (name)",
      "CREATE UNIQUE INDEX idx_email ON users (email)",
      "DROP TABLE IF EXISTS users",
      "DROP TABLE users",
      "DROP INDEX IF EXISTS idx",
      "DESCRIBE TABLE users",
      "DESCRIBE NODE person",
      "DESCRIBE EDGE follows",
      "INSERT INTO users (name, email) VALUES ('Alice', 'alice@example.com')",
      "INSERT INTO t (a, b) VALUES (1, 2), (3, 4)",
      "INSERT INTO archive SELECT * FROM users WHERE active = false",
      "INSERT INTO t (a, b) SELECT x, y FROM s",
      "SELECT * FROM users",
      "SELECT * FROM users WHERE id = 1",
      "SELECT id, name, email FROM users",
      "SELECT name AS user_name FROM users",
      "SELECT DISTINCT name FROM users",
      "SELECT COUNT(DISTINCT name) FROM users",
      "SELECT a, COUNT(*) FROM t GROUP BY a",
      "SELECT name, COUNT(*) FROM users GROUP BY name HAVING COUNT(*) > 1",
      "SELECT * FROM t ORDER BY a ASC, b DESC",
      "SELECT * FROM t LIMIT 10 OFFSET 5",
      "SELECT * FROM a INNER JOIN b ON a.id = b.id",
      "SELECT * FROM a FULL OUTER JOIN b ON a.id = b.id",
      "SELECT * FROM a NATURAL JOIN b",
      "SELECT * FROM a JOIN b USING (id, name)",
      "SELECT * FROM users u JOIN orders o ON u.id = o.user_id",
      "SELECT * FROM (SELECT 1 AS x) AS sub",
      "SELECT * FROM t WHERE x IN (SELECT y FROM s)",
      "SELECT * FROM t WHERE EXISTS (SELECT 1 FROM s)",
      "SELECT * FROM t WHERE name LIKE '%foo%'",
      "SELECT * FROM t WHERE age NOT BETWEEN 10 AND 20",
      "SELECT * FROM t WHERE x IS NOT NULL",
      "SELECT a FROM t1 UNION SELECT b FROM t2",
      "SELECT a FROM t1 INTERSECT SELECT b FROM t2",
      "SELECT a FROM t1 EXCEPT SELECT b FROM t2",
      "SELECT name FROM users UNION ALL SELECT name FROM admins",
      "SELECT CASE WHEN age > 18 THEN 'adult' ELSE 'minor' END FROM users",
      "SELECT CAST(age AS VARCHAR) FROM users",
      "SELECT COALESCE(a, b, c, d) FROM t",
      "SELECT COUNT(*), SUM(amount), AVG(price) FROM orders",
      "UPDATE users SET name = 'Bob' WHERE id = 1",
      "UPDATE users SET active = TRUE",
      "UPDATE t SET a = 1, b = 2, c = 3 WHERE id = 1",
      "DELETE FROM users WHERE id = 1",
      "DELETE FROM users",
      "DELETE FROM t WHERE a = 1 AND b = 2 OR c = 3",
      "SHOW TABLES",
      "SHOW TABLES;",
      "show tables",
      // EMBED family (incl. the reference tuple-list batch + INTO coll)
      "EMBED BATCH [('doc1', [1.0, 0.0]), ('doc2', [0.0, 1.0])]",
      "EMBED BATCH [('k1', [1.0]), ('k2', [2.0])] INTO batch_coll",
      "EMBED BATCH [('key', [1.0, 2.0, 3.0])]",
      "EMBED BUILD INDEX",
      "EMBED DELETE 'doc1'",
      "EMBED DELETE 'doc1' INTO my_collection",
      "EMBED GET 'doc1'",
      "EMBED GET 'doc1' INTO my_collection",
      "EMBED STORE 'doc1' [0.1, 0.2, 0.3]",
      "EMBED STORE 'doc1' [1.0, 2.0, 3.0] INTO my_collection",
      "SHOW EMBEDDINGS",
      "SHOW EMBEDDINGS LIMIT 10",
      "SHOW VECTOR INDEX",
      // ENTITY family (incl. reference brace-props update + batch list)
      "ENTITY BATCH CREATE []",
      "ENTITY BATCH CREATE [{key: 'k1', from: 'source'}]",
      "ENTITY CONNECT 'user:alice' -> 'user:bob' : follows",
      "ENTITY CREATE 'user:1' { name: 'Alice', age: '30' }",
      "ENTITY CREATE 'doc:1' { title: 'Test' } EMBEDDING [0.1, 0.2, 0.3]",
      "ENTITY DELETE 'user:123'",
      "ENTITY GET 'user:1'",
      "ENTITY UPDATE 'user:1' { name: 'Bob' }",
      "ENTITY UPDATE 'user:1' {name: 'Bob'} EMBEDDING [1.0, 2.0]",
      // FIND family (singular NODE/EDGE, bare labels, boolean literals)
      "FIND EDGE FOLLOWS",
      "FIND EDGE FOLLOWS WHERE weight > 0.5",
      "FIND EDGE WHERE weight > 0.5",
      "FIND NODE Person LIMIT 10",
      "FIND NODE Person WHERE age > 18",
      "FIND NODE WHERE active = TRUE",
      "FIND NODE user RETURN name, age",
      "FIND NODE user WHERE age > 18 LIMIT 10",
      "FIND ROWS FROM users WHERE age > 18",
      "FIND VERTEX person",
      "FIND WHERE x > 1",
      "FIND",
      // GRAPH algorithm family (bare edge types, CENTRALITY suffixes,
      // fractional SAMPLING, every knob combination the corpus uses)
      "GRAPH BETWEENNESS CENTRALITY",
      "GRAPH BETWEENNESS CENTRALITY EDGE TYPE follows",
      "GRAPH BETWEENNESS CENTRALITY INCOMING",
      "GRAPH BETWEENNESS CENTRALITY OUTGOING",
      "GRAPH BETWEENNESS CENTRALITY SAMPLING 0.5",
      "GRAPH CLOSENESS CENTRALITY",
      "GRAPH CLOSENESS CENTRALITY EDGE TYPE knows",
      "GRAPH CLOSENESS CENTRALITY INCOMING",
      "GRAPH EIGENVECTOR CENTRALITY",
      "GRAPH EIGENVECTOR CENTRALITY BOTH",
      "GRAPH EIGENVECTOR CENTRALITY EDGE TYPE follows",
      "GRAPH EIGENVECTOR CENTRALITY ITERATIONS 100",
      "GRAPH EIGENVECTOR CENTRALITY ITERATIONS 50 TOLERANCE 0.0001",
      "GRAPH EIGENVECTOR CENTRALITY TOLERANCE 0.001",
      "GRAPH LABEL PROPAGATION",
      "GRAPH LABEL PROPAGATION EDGE TYPE connects",
      "GRAPH LABEL PROPAGATION INCOMING",
      "GRAPH LABEL PROPAGATION ITERATIONS 20",
      "GRAPH LOUVAIN COMMUNITIES",
      "GRAPH LOUVAIN COMMUNITIES EDGE TYPE friend",
      "GRAPH LOUVAIN COMMUNITIES OUTGOING",
      "GRAPH LOUVAIN COMMUNITIES PASSES 10",
      "GRAPH LOUVAIN COMMUNITIES RESOLUTION 1.5",
      "GRAPH LOUVAIN COMMUNITIES RESOLUTION 1.5 BOTH EDGE TYPE friend PASSES 20",
      // the shell help's GRAPH ALGORITHM / CONSTRAINT / BATCH / PATTERN
      // MATCH prefixes (help.rs:158-225 — rejected by the reference's
      // own parser; accepted here so its documentation runs)
      "GRAPH ALGORITHM PAGERANK",
      "GRAPH ALGORITHM BETWEENNESS SAMPLING 0.5",
      "GRAPH ALGORITHM LABEL_PROPAGATION",
      "GRAPH ALGORITHM LOUVAIN PASSES 2",
      "GRAPH CONSTRAINT LIST",
      "GRAPH CONSTRAINT CREATE gc1 ON NODE PROPERTY age TYPE int",
      "GRAPH BATCH CREATE NODES [{labels: [x], name: 'gb'}]",
      "GRAPH PATTERN MATCH (a:customer)-[:in_nation]->(b:nation) RETURN a.key LIMIT 3",
      "GRAPH PAGERANK",
      "GRAPH PAGERANK DAMPING 0.85",
      "GRAPH PAGERANK DAMPING 0.85 ITERATIONS 100 TOLERANCE 0.001 OUTGOING",
      "GRAPH PAGERANK DAMPING 0.9 ITERATIONS 20",
      "GRAPH PAGERANK EDGE TYPE follows",
      "GRAPH PAGERANK OUTGOING",
      // NODE / EDGE CRUD (reference label+brace create, bare-label list,
      // OFFSET pagination)
      "NODE CREATE person {name: 'Alice'}",
      "NODE CREATE user {name: 'Alice', age: 30}",
      "NODE CREATE city name='A'",
      "NODE CREATE Person name='Alice' age=30",
      "NODE LIST",
      "NODE LIST LIMIT 10",
      "NODE LIST Person LIMIT 10 OFFSET 5",
      "NODE LIST user",
      "NODE LIST user LIMIT 50 OFFSET 100",
      "EDGE LIST",
      "EDGE LIST FOLLOWS",
      "EDGE LIST FOLLOWS LIMIT 10",
      "EDGE LIST FOLLOWS LIMIT 25 OFFSET 50",
      // SIMILAR family (bare trailing metric, INTO collection, inline
      // vectors, compound WHERE)
      "SIMILAR 'doc' DOT_PRODUCT",
      "SIMILAR 'doc' EUCLIDEAN",
      "SIMILAR 'doc1' LIMIT 10 COSINE",
      "SIMILAR 'doc1' LIMIT 10 WHERE category = 'tech' AND score > 5",
      "SIMILAR 'entity' CONNECTED TO 'hub' LIMIT 5",
      "SIMILAR 'query'",
      "SIMILAR 'query' DOT_PRODUCT LIMIT 5",
      "SIMILAR [0.1, 0.2] LIMIT 5",
      "SIMILAR [1.0, 2.0]",
      "SIMILAR [1.0, 2.0] LIMIT 10 EUCLIDEAN",
      "SIMILAR [1.0, 2.0] LIMIT 10 INTO my_collection",
      "SIMILAR [1.0, 2.0] LIMIT 10 WHERE category = 'science'",
      "SIMILAR [1.0, 2.0] LIMIT 5 COSINE",
      "SIMILAR [1.0, 2.0] LIMIT 5 DOT_PRODUCT",
      "SIMILAR [1.0, 2.0] LIMIT 5 INTO docs WHERE author = 'Alice'",
      // the reference's full Cypher test corpus (parser.rs / lib.rs /
      // integration query_router_engine_paths.rs — it is this small)
      "MATCH (n:person) RETURN n",
      "MATCH (n:user) WHERE n.name = 'Alice' RETURN n",
      "MATCH (n:test_label) DELETE n",
      "MERGE (n:person {name: 'Charlie'})",
      // router legacy surface (query_router lib.rs:23, 6620, 6903-6929):
      // EMBED shorthand store, bare keys, TOP as the limit keyword
      "EMBED doc1 [1.0, 0.0, 0.0]",
      "EMBED a [1.0, 0.0]",
      "EMBED coll_vec1 [1.0, 0.0, 0.0] INTO test_coll",
      "SIMILAR doc1 TOP 2",
      "SIMILAR a TOP 2",
      "SIMILAR [1.0, 0.0, 0.0] TOP 2",
      "SIMILAR [1.0, 0.0, 0.0] IN test_coll TOP 5",
      "SIMILAR [0.9, 0.1, 0.0] TOP 1")

    val mustRejectTyped = Seq(
      // out-of-scope subsystems (COVERAGE.md): vault, cache, blob admin,
      // chain, cluster, checkpoints, codebook analytics
      "VAULT SET 'key1' 'value1'", "VAULT GET 'mykey'", "VAULT LIST",
      "VAULT GRANT 'user123' ON 'secret/key'", "VAULT ROTATE 'mykey' 'newvalue'",
      "CACHE INIT", "CACHE PUT 'mykey' 'myvalue'", "CACHE GET 'mykey'",
      "CACHE SEMANTIC GET 'query' THRESHOLD 0.85",
      "CACHE SEMANTIC PUT 'q' 'r' EMBEDDING [1.0, 2.0, 3.0, 4.0, 5.0]",
      "cache init",
      "BLOB PUT 'file.txt' FROM '/path/to/file'", "BLOB GET 'artifact123'",
      "BLOB INIT", "BLOB GC FULL", "BLOB META SET 'artifact123' 'description' 'A test file'",
      "BLOBS", "BLOBS '*.txt'", "BLOBS BY TAG 'important'", "BLOBS FOR 'entity1'",
      "BLOBS WHERE TYPE = 'application/pdf'",
      "CHAIN TIP", "CHAIN HEIGHT", "CHAIN VERIFY", "CHAIN BLOCK 42",
      "CHAIN SIMILAR [1.0, 2.0] LIMIT 5", "CHAIN HISTORY 'users:123'",
      "BEGIN CHAIN TRANSACTION", "COMMIT CHAIN", "ROLLBACK CHAIN TO 100",
      "CHECKPOINT", "CHECKPOINT 'backup1'", "CHECKPOINTS", "CHECKPOINTS LIMIT 5",
      "ROLLBACK TO 'checkpoint-id'",
      "CLUSTER CONNECT '127.0.0.1:8080'", "CLUSTER STATUS", "CLUSTER NODES",
      "ANALYZE CODEBOOK TRANSITIONS",
      "GRAPH INDEX CREATE ON NODE PROPERTY name", "GRAPH INDEX SHOW ON NODE",
      // spellings whose semantics don't map: integer auto-ids (this
      // engine keys by string), edge ids, edge properties
      "NODE GET 1", "NODE DELETE 123", "NODE CREATE user {}",
      "NODE CREATE Person age=20", // no key/name prop → typed (string-keyed store)
      "CREATE (n:Animal {species: 'Dog'})", // same: no identity property
      "EDGE CREATE 1 2 label",
      "EDGE CREATE 1 -> 2 : follows", "EDGE CREATE 1 -> 2 : FOLLOWS {since: 2020}",
      "EDGE GET 42", "EDGE DELETE 1",
      "NEIGHBORS 1", "NEIGHBORS 1 OUTGOING : FOLLOWS", "NEIGHBORS 123 OUTGOING LIMIT 20",
      "PATH 1 -> 2", "PATH SHORTEST 1 -> 10",
      "BATCH DELETE EDGES [10, 20]",
      "BATCH CREATE EDGES [{from: 1, to: 2, type: knows, weight: 0.5}]",
      "BATCH CREATE EDGES [{from: 1, to: 2}]",   // missing type (reference rejects too)
      "BATCH CREATE EDGES [{from: 1, type: follows}]", // missing to
      "BATCH CREATE EDGES [{to: 2, type: follows}]",   // missing from
      "NEIGHBORS 'entity' BY SIMILAR [1.0, 0.0] LIMIT 5",
      // malformed forms the reference also rejects
      "EMBED STORE 'key' []", "SIMILAR [] LIMIT 5",
      ";;;SELECT * FROM users;;",
      // trailing junk rejects instead of being silently ignored
      "NODE GET 'k' extra", "ENTITY GET 'k' 42", "EMBED GET 'k' INTO c junk",
      // router-legacy error cases stay errors here too
      "SIMILAR v TOP notanumber", "EMBED bad [not,a,vector]", "EMBED key []")

    assert(mustParse.size + mustRejectTyped.size >= 150)
    mustParse.foreach { q =>
      try { NqlParser.parse(q); () } catch {
        case e: Throwable => fail(s"in-scope reference statement failed to parse <$q>: " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    mustRejectTyped.foreach { q =>
      val e = intercept[NqlParseException](NqlParser.parse(q))
      assert(e.getMessage != null && e.getMessage.nonEmpty, s"empty error message for <$q>")
    }
    // and every statement in both lists satisfies the no-leak contract
    (mustParse ++ mustRejectTyped).foreach(mustParseOrReject)
  }

  test("reference corpus EXECUTION sweep: in-scope NQL statements run or fail typed") {
    // One level deeper than the parse sweep: every parse-able NQL
    // statement from the reference corpus is EXECUTED against the
    // sf0.001 fixture with a live store, and must either produce a frame
    // or raise one of the two typed errors (NqlParseException for
    // statement-shape problems, NqlExecException for domain errors) —
    // never a raw AnalysisException/NPE/match error out of the compile
    // path. SQL passthrough statements are excluded (they reference the
    // corpus's own table names; Catalyst's resolution errors over
    // unknown tables are the SQL engine's contract, not a leak).
    val spark = TestSpark.spark
    val store = new graft.unified.EntityStore(spark,
      java.nio.file.Files.createTempDirectory("fuzz-exec-store").toString)
    // seed the store so key-addressed statements have something to hit
    graft.nql.Nql.execute(spark, TestSpark.sf, store,
      "BATCH CREATE NODES [{labels: [person], key: 'user:1', name: 'Alice', age: 30}]")
    graft.nql.Nql.execute(spark, TestSpark.sf, store,
      "ENTITY CREATE 'doc1' SET kind = 'doc' EMBEDDING (1.0, 0.0)")
    val stmts = Seq(
      "AGGREGATE NODE PROPERTY acctbal MIN BY LABEL customer",
      "AGGREGATE NODE PROPERTY age SUM",            // unknown prop → typed
      "AGGREGATE EDGE PROPERTY weight AVG ON in_nation",
      "AGGREGATE EDGE PROPERTY weight COUNT WHERE value > 0",
      "BATCH CREATE NODES []", "BATCH CREATE EDGES []", "BATCH UPDATE NODES []",
      "BATCH CREATE NODES [{labels: [Person], name: 'Bob'}]",
      "BATCH UPDATE NODES [{id: 'user:1', age: 31}]",
      "BATCH UPDATE NODES [{id: 999, name: 'X'}]",  // absent id → typed
      "BATCH DELETE NODES [1, 2, 3]",               // absent keys tombstone fine
      "BLOBS SIMILAR TO 'doc1' LIMIT 5",
      "COUNT EMBEDDINGS",
      "SHOW EMBEDDINGS LIMIT 10", "SHOW VECTOR INDEX",
      "DESCRIBE NODE person", "DESCRIBE EDGE follows",
      "EMBED BATCH [('e1', [1.0, 0.0]), ('e2', [0.0, 1.0])]",
      "EMBED BUILD INDEX", "EMBED GET 'doc1'", "EMBED DELETE 'doc1'",
      "EMBED STORE 'doc2' [0.5, 0.5]",
      "ENTITY BATCH CREATE [{key: 'k1', from: 'source'}]",
      "ENTITY GET 'user:1'",
      "ENTITY UPDATE 'user:1' { name: 'Bob' }",
      "ENTITY UPDATE 'user:1' {name: 'Bob'} EMBEDDING [1.0, 2.0]",
      "ENTITY UPDATE 'absent' { name: 'X' }",       // missing key → typed
      "ENTITY DELETE 'user:1'",
      "FIND EDGE in_region", "FIND EDGE WHERE weight > 0.5", // unknown col → typed
      "FIND NODE person WHERE age > 18",
      "FIND NODE WHERE active = TRUE",
      "FIND NODE person RETURN name, age",          // prop RETURN w/o prop WHERE → typed or rows
      "FIND VERTEX region",
      "FIND ROWS FROM orders WHERE o_totalprice > 10.0 RETURN o_orderkey LIMIT 5",
      "GRAPH BETWEENNESS CENTRALITY SAMPLING 0.5",
      "GRAPH CLOSENESS CENTRALITY EDGE TYPE in_nation",
      "GRAPH EIGENVECTOR CENTRALITY ITERATIONS 4 TOLERANCE 0.0001",
      "GRAPH LABEL PROPAGATION ITERATIONS 3",
      "GRAPH LOUVAIN COMMUNITIES RESOLUTION 1.5 PASSES 2",
      "GRAPH PAGERANK DAMPING 0.9 ITERATIONS 5",
      "GRAPH PAGERANK EDGE TYPE in_region OUTGOING",
      "NODE CREATE town {key: 'fx:1', name: 'fxtown'}",
      "NODE CREATE user {}",                        // parse-level typed
      "NODE LIST person LIMIT 10 OFFSET 1",
      "EDGE LIST in_region LIMIT 5 OFFSET 2",
      "SIMILAR 'vec:0' DOT_PRODUCT LIMIT 5",
      "SIMILAR 'vec:0' LIMIT 5 COSINE",
      "SIMILAR [1.0, 0.0] LIMIT 5 EUCLIDEAN",
      "SIMILAR [1.0, 0.0] LIMIT 5 INTO nosuchcoll", // unknown collection → typed or empty
      "SIMILAR 'absent-key' LIMIT 3",               // unknown key → typed or empty
      // round-8 legacy-surface paths, executed end-to-end
      "EMBED legacy1 [1.0, 0.0]",
      "SIMILAR legacy1 TOP 2",
      "ENTITY CONNECT 'user:1' -> 'doc1' : cites",
      "NODE CREATE town name='exectown' mayor='ann'",
      "AGGREGATE NODE PROPERTY acctbal AVG ON customer",
      "BATCH CREATE EDGES [{from: 'user:1', to: 'doc1', type: rel}]",
      "FIND",
      "FIND WHERE age > 18")
    stmts.foreach { q =>
      try { graft.nql.Nql.execute(spark, TestSpark.sf, store, q).limit(5).collect(); () }
      catch {
        case _: NqlParseException => ()
        case _: graft.nql.NqlExecException => ()
        case e: Throwable =>
          fail(s"execution leaked ${e.getClass.getSimpleName} on <$q>: ${e.getMessage}")
      }
    }
  }

  test("cypher pattern fragments reject cleanly") {
    val frags = Seq("(", "(a", "(a:b", "(a {", "(a {k:", "(a)-", "(a)-[",
      "(a)-[:t", "(a)-[:t]-", "(a)-[:t]->", "(a)-[:t]->(b) RETURN",
      "(a)-[:t*1..", "(a)<-[:t]-(b) WHERE", "(a) DELETE", "(a) SET x")
    frags.foreach(f => try { CypherParser.parse("MATCH " + f); () } catch {
      case _: NqlParseException => ()
      case e: Throwable =>
        fail(s"cypher parser leaked ${e.getClass.getSimpleName} on <MATCH $f>")
    })
  }
}
