package graft.nql

import graft.QDef

/** Gate queries that run *through the NQL/Cypher front door* (parser +
  * compiler), so the driver's correctness gate exercises the full query
  * surface, not just the DataFrame layer underneath.
  */
object NqlQueries {

  val defs: Seq[(String, QDef)] = Seq(

    // Cypher chain with label + property-map filter and direction.
    "c01_cypher_chain" -> QDef(
      (s, d) => Nql.execute(s, d,
        "MATCH (n:nation)-[:in_region]->(r:region {name: 'ASIA'}) " +
          "RETURN n.name, r.name ORDER BY n.name"),
      """SELECT n.n_name AS n_name, r.r_name AS r_name
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' ORDER BY n_name""".stripMargin),

    // Variable-length undirected hops *1..2 over the same_region cliques:
    // 1 hop reaches the 4 region-mates, 2 hops adds the start node back —
    // so the answer is the full 5-nation region (including the start).
    "c02_cypher_varlength" -> QDef(
      (s, d) => Nql.execute(s, d,
        "MATCH (a:nation {name: 'NATION_3'})-[:same_region*1..2]-(b:nation) " +
          "RETURN b.name ORDER BY b.name"),
      """SELECT b.n_name AS b_name
        |FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        |WHERE a.n_name = 'NATION_3' ORDER BY b_name""".stripMargin),

    // OPTIONAL MATCH (left-outer extension) + SKIP: ASIA's nations keep a
    // row even when they have no suppliers (null s_key — at sf0.001 only
    // 10 of 25 nations have any), then the ordered rows are paged.
    // Spark ASC sorts nulls first, so the oracle says NULLS FIRST.
    "c04_cypher_optional_skip" -> QDef(
      (s, d) => Nql.execute(s, d,
        "MATCH (n:nation)-[:in_region]->(r:region {name: 'ASIA'}) " +
          "OPTIONAL MATCH (n)<-[:in_nation]-(sup:supplier) " +
          "RETURN n.name, sup.key ORDER BY n.name, sup.key SKIP 2 LIMIT 10"),
      """SELECT n_name, sup_key FROM (
        |  SELECT n.n_name AS n_name,
        |         'supplier:' || CAST(s.s_suppkey AS VARCHAR) AS sup_key
        |  FROM nation n
        |  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        |  LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey) t
        |ORDER BY n_name, sup_key NULLS FIRST
        |OFFSET 2 LIMIT 10""".stripMargin),

    // Pattern-match COUNT statement form (reference count/exists forms,
    // graph_engine/src/lib.rs:5945-6090): counts full binding rows of a
    // 2-hop motif chain through the NQL front door.
    "g33_match_count" -> QDef(
      (s, d) => Nql.execute(s, d,
        "GRAPH MATCH COUNT (c:customer)-[:in_nation]->(n:nation)-[:in_region]->(r:region)"),
      """SELECT count(*) AS n_matches
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin),

    // ANN index statement front (reference EMBED BUILD INDEX ast.rs:703 +
    // router index-vs-brute routing query_router/src/lib.rs:5414-5447):
    // EMBED BUILD INDEX IVF registers deterministic label cells with mean
    // centroids (the v08 construction), SIMILAR ... USING INDEX probes the
    // 2 nearest cells and exact-ranks inside them — so the full statement
    // path is oracle-checkable.
    "v11_nql_ivf_search" -> QDef(
      (s, d) => {
        Nql.execute(s, d, "EMBED BUILD INDEX IVF").count()
        Nql.execute(s, d, "SIMILAR 'vec:5' USING INDEX PROBES 2 LIMIT 8")
      },
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 5),
        |flat AS (SELECT label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x FROM embeddings),
        |cent AS (SELECT label, list(cx ORDER BY i) AS centroid
        |         FROM (SELECT label, i, avg(x) AS cx FROM flat GROUP BY label, i) GROUP BY label),
        |probed AS (SELECT label FROM cent, q
        |         ORDER BY list_cosine_similarity(CAST(centroid AS FLOAT[])::DOUBLE[], q.embedding::DOUBLE[]) DESC, label
        |         LIMIT 2)
        |SELECT 'vec:' || CAST(e.vec_id AS VARCHAR) AS key,
        |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS score
        |FROM embeddings e JOIN probed ON e.label = probed.label, q
        |WHERE e.vec_id <> 5
        |ORDER BY score DESC, key LIMIT 8""".stripMargin),

    // Multi-pattern MATCH (comma-separated chains, Cypher semantics:
    // shared variable `n` joins the chains on the same node) — customers
    // and suppliers co-located in one nation. Parity-plus: the reference
    // executor runs a single chain (`query_router/src/cypher.rs:47-201`).
    "c05_cypher_multipattern" -> QDef(
      (s, d) => Nql.execute(s, d,
        "MATCH (c:customer)-[:in_nation]->(n:nation {name: 'NATION_3'}), " +
          "(sup:supplier)-[:in_nation]->(n) " +
          "RETURN c.key, sup.key, n.name ORDER BY c.key, sup.key LIMIT 25"),
      """SELECT c_key, sup_key, n_name FROM (
        |  SELECT 'customer:' || CAST(c.c_custkey AS VARCHAR) AS c_key,
        |         'supplier:' || CAST(s.s_suppkey AS VARCHAR) AS sup_key,
        |         n.n_name AS n_name
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
        |  JOIN supplier s ON s.s_nationkey = n.n_nationkey) t
        |ORDER BY c_key, sup_key LIMIT 25""".stripMargin),

    // BLOB-similarity statement (reference BLOBS SIMILAR TO,
    // `ast.rs:1127-1167` — SURVEY §2.15's one in-scope admin op):
    // embedding search over binary artifacts through the NQL front door.
    "b01_blobs_similar" -> QDef(
      (s, d) => Nql.execute(s, d, "BLOBS SIMILAR TO 'vec:3' LIMIT 10"),
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 3)
        |SELECT 'blob:' || CAST(d.doc_id AS VARCHAR) AS blob_key,
        |  CAST(octet_length(CAST(d.text AS BLOB)) AS INT) AS n_bytes,
        |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS score
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id, q
        |WHERE e.vec_id <> 3
        |ORDER BY score DESC, blob_key LIMIT 10""".stripMargin),

    // GRAPH AGGREGATE statement form (reference AggregateNodeProperty,
    // `ast.rs:1430-1487`, executor `graph_engine/src/lib.rs:5705-5829`):
    // property aggregation with label + WHERE filter through the front
    // door. SUM runs on 1e-2-quantized longs so the value is exact and
    // partition-order independent (the g28 policy), which the oracle
    // mirrors with an integer sum.
    "g43_graph_aggregate" -> QDef(
      (s, d) => Nql.execute(s, d,
        "GRAPH AGGREGATE SUM 'acctbal' NODES LABEL 'customer' WHERE value > 0"),
      """SELECT 'sum' AS func, 'acctbal' AS prop,
        |  round(sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0, 4) AS value
        |FROM customer WHERE c_acctbal > 0""".stripMargin),

    // COUNT NODES / COUNT EDGES statement forms (reference CountNodes/
    // CountEdges): two front-door counts folded into one gate row.
    "g44_graph_counts" -> QDef(
      (s, d) => Nql.execute(s, d, "GRAPH COUNT NODES LABEL 'customer'")
        .crossJoin(Nql.execute(s, d, "GRAPH COUNT EDGES TYPE 'in_nation'")),
      """SELECT (SELECT count(*) FROM customer) AS n_nodes,
        |       (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier) AS n_edges""".stripMargin),

    // Range search statement (threshold-bounded similarity — the top-k
    // family's complement): every vector at rounded cosine >= 0.30 to (non-empty at every SF:
    // 4/3/13 rows at sf0.001/0.01/0.1), through the NQL front door.
    "v21_range_search" -> QDef(
      (s, d) => Nql.execute(s, d, "SIMILAR RANGE 'vec:0' THRESHOLD 30"),
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
        |SELECT 'vec:' || CAST(e.vec_id AS VARCHAR) AS key,
        |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS score
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |  AND round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) >= 0.30
        |ORDER BY score DESC, key""".stripMargin),

    // COUNT EMBEDDINGS statement (reference `parser.rs:1550-1562`)
    // through the front door — one count over the bundled vectors.
    "v23_count_embeddings" -> QDef(
      (s, d) => Nql.execute(s, d, "COUNT EMBEDDINGS"),
      "SELECT count(*) AS n_embeddings FROM embeddings"),

    // DESCRIBE NODE statement (reference DescribeTarget::Node,
    // `parser.rs:1527-1548`): property census of the nation label —
    // fixed-schema columns, every one present on all 25 nations.
    "g48_describe_node" -> QDef(
      (s, d) => Nql.execute(s, d, "DESCRIBE NODE nation"),
      """SELECT property, n_present FROM (
        |  SELECT 'key' AS property, count(*) AS n_present FROM nation
        |  UNION ALL SELECT 'label', count(*) FROM nation
        |  UNION ALL SELECT 'name', count(*) FROM nation) t
        |ORDER BY property""".stripMargin),

    // NEIGHBORS with the reference's direction keyword: OUTGOING from a
    // nation crosses exactly its region edge plus the higher-keyed
    // same-region clique peers (stored src < dst).
    "g49_neighbors_outgoing" -> QDef(
      (s, d) => Nql.execute(s, d, "NEIGHBORS 'nation:3' OUTGOING"),
      """SELECT neighbor, etype FROM (
        |  SELECT 'region:' || CAST(n_regionkey AS VARCHAR) AS neighbor,
        |         'in_region' AS etype
        |  FROM nation WHERE n_nationkey = 3
        |  UNION ALL
        |  SELECT 'nation:' || CAST(b.n_nationkey AS VARCHAR), 'same_region'
        |  FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        |   AND a.n_nationkey < b.n_nationkey
        |  WHERE a.n_nationkey = 3) t
        |ORDER BY neighbor""".stripMargin),

    // Reversed-arrow direction + WHERE on a bound variable.
    "c03_cypher_reverse_where" -> QDef(
      (s, d) => Nql.execute(s, d,
        "MATCH (r:region {name: 'EUROPE'})<-[:in_region]-(n:nation) " +
          "WHERE n.key <> 'nation:999' RETURN n.key, n.name ORDER BY n.name"),
      """SELECT 'nation:' || CAST(n.n_nationkey AS VARCHAR) AS n_key, n.n_name AS n_name
        |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'EUROPE' ORDER BY n_name""".stripMargin)
  )
}
