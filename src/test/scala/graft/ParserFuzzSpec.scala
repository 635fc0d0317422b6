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
    "CORES", "TRANSITIVITY", "LOUVAIN", "BETWEENNESS", "AGGREGATE")
  private val atoms = Seq("'x'", "'nation:0'", "''", "1", "42", "-3",
    "0.5", "(", ")", ",", "=", "<", ">=", "<>", "*", "foo", "a_b.c")

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
