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
