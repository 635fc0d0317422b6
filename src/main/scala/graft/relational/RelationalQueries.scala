package graft.relational

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator inventory (SURVEY.md §2.1–§2.9) re-expressed as
  * declarative DataFrame plans. Where the reference only *parses* a
  * construct (LIKE/IN/BETWEEN/CASE/CAST/subqueries — SURVEY §2.3) we
  * execute it for real via Catalyst.
  *
  * Conventions shared with the DuckDB oracles:
  *  - every aggregate / computed column is aliased identically on both sides;
  *  - double-valued aggregates are rounded (sums of 2-dec data → 2,
  *    products → 4, averages → 6) so bit-level accumulation-order noise
  *    cannot flip the driver's hash compare;
  *  - every result carries a deterministic total ORDER BY.
  *
  * Reference semantics notes: filters/joins/aggs mirror
  * `relational_engine/src/lib.rs` (joins :4021-4410, aggregates :4423-4742,
  * group-by :3581-3674); we adopt SQL 3VL null semantics (SURVEY §7 M0
  * decision) to stay oracle-compatible.
  */
object RelationalQueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  val defs: Seq[(String, QDef)] = Seq(

    // ---- scans / filters / projection (§2.2, §2.3) ----
    "q01_agg_pricing_summary" -> QDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-31").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(avg(l_quantity),6) AS avg_qty,
        | round(avg(l_extendedprice),6) AS avg_price,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin),

    "q02_filter_project_sort" -> QDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500),
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity > 45 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin),

    "q03_like_in_between" -> QDef(
      (s, d) => t(s, d, "part")
        .filter(col("p_type").like("%AND%") &&
          col("p_size").between(10, 30) &&
          col("p_brand").isin("Brand#1", "Brand#12", "Brand#22"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey"),
      """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
        |WHERE p_type LIKE '%AND%' AND p_size BETWEEN 10 AND 30
        |  AND p_brand IN ('Brand#1','Brand#12','Brand#22')
        |ORDER BY p_partkey""".stripMargin),

    "q04_case_cast_arithmetic" -> QDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_quantity") >= 40, "bulk")
            .when(col("l_quantity") >= 20, "mid")
            .otherwise("small").as("qty_band"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_floor"),
          (col("l_quantity") * 2 + 1).as("qx"))
        .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber,
        | CASE WHEN l_quantity >= 40 THEN 'bulk' WHEN l_quantity >= 20 THEN 'mid' ELSE 'small' END AS qty_band,
        | CAST(floor(l_extendedprice*(1-l_discount)) AS BIGINT) AS net_floor,
        | l_quantity*2+1 AS qx
        |FROM lineitem WHERE l_orderkey < 1000 ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // ---- joins (§2.4) ----
    "q05_join_inner_agg" -> QDef(
      (s, d) => t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(round(sum("o_totalprice"), 2).as("total_rev"), count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment"),
      """SELECT c_mktsegment, round(sum(o_totalprice),2) AS total_rev, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    "q06_join_left" -> QDef(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spend"))
        .orderBy("c_custkey"),
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        | round(coalesce(sum(o_totalprice),0),2) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    "q07_join_right" -> QDef(
      (s, d) => t(s, d, "supplier")
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"), "right")
        .groupBy("n_nationkey", "n_name")
        .agg(count(col("s_suppkey")).as("n_suppliers"))
        .orderBy("n_nationkey"),
      """SELECT n_nationkey, n_name, count(s_suppkey) AS n_suppliers
        |FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin),

    "q08_join_full_outer" -> QDef(
      (s, d) => {
        val c = t(s, d, "customer").groupBy(col("c_nationkey").as("k")).agg(count(lit(1)).as("n_cust"))
        val p = t(s, d, "supplier").groupBy(col("s_nationkey").as("k2")).agg(count(lit(1)).as("n_supp"))
        c.join(p, col("k") === col("k2"), "full")
          .select(coalesce(col("k"), col("k2")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy("nationkey")
      },
      """SELECT coalesce(c.k, s.k2) AS nationkey, coalesce(n_cust,0) AS n_cust, coalesce(n_supp,0) AS n_supp
        |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT s_nationkey AS k2, count(*) AS n_supp FROM supplier GROUP BY 1) s ON c.k = s.k2
        |ORDER BY nationkey""".stripMargin),

    "q09_join_cross" -> QDef(
      (s, d) => t(s, d, "region").crossJoin(t(s, d, "nation"))
        .select("r_name", "n_name").orderBy("r_name", "n_name"),
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"),

    "q10_join_natural" -> QDef(
      (s, d) => t(s, d, "nation").withColumnRenamed("n_regionkey", "regionkey")
        .join(broadcast(t(s, d, "region").withColumnRenamed("r_regionkey", "regionkey")), Seq("regionkey"))
        .select("n_name", "r_name").orderBy("n_name"),
      """SELECT n_name, r_name
        |FROM (SELECT n_name, n_regionkey AS regionkey FROM nation) a
        |NATURAL JOIN (SELECT r_regionkey AS regionkey, r_name FROM region) b
        |ORDER BY n_name""".stripMargin),

    "q11_join_semi" -> QDef(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey"),
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),

    "q12_join_anti" -> QDef(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey"),
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    "q13_join_multiway" -> QDef(
      (s, d) => {
        val li = t(s, d, "lineitem"); val o = t(s, d, "orders"); val c = t(s, d, "customer")
        val su = t(s, d, "supplier"); val n = t(s, d, "nation"); val r = t(s, d, "region")
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
        |  AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),

    // ---- aggregation (§2.5) ----
    "q14_group_having" -> QDef(
      (s, d) => t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 20)
        .orderBy(desc("n"), col("o_custkey")),
      """SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 20 ORDER BY n DESC, o_custkey""".stripMargin),

    "q15_distinct" -> QDef(
      (s, d) => t(s, d, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus"),
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    "q16_count_distinct" -> QDef(
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    "q17_order_limit_offset" -> QDef(
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .offset(10).limit(20),
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10""".stripMargin),

    // ---- set operations (§2.8; absent in the reference's surface, SQL-standard here) ----
    "q18_union" -> QDef(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
        .union(t(s, d, "supplier").select(col("s_nationkey").cast("int")))
        .distinct().orderBy("nationkey"),
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin),

    "q19_intersect" -> QDef(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").cast("int")))
        .orderBy("nationkey"),
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin),

    "q20_except" -> QDef(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").cast("int").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").cast("int")))
        .orderBy("nationkey"),
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""".stripMargin),

    // ---- window functions (§2.6 — absent in reference; Spark-native upgrade) ----
    "q21_window_topk_per_group" -> QDef(
      (s, d) => {
        val joined = t(s, d, "orders")
          .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy("c_mktsegment").orderBy(desc("o_totalprice"), col("o_orderkey"))
        joined.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
          .orderBy("c_mktsegment", "rn")
      },
      """SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) q
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin),

    "q22_window_running_lag" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders").filter(col("o_custkey") < 100)
          .withColumn("running_spend",
            round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .withColumn("prev_price", round(lag("o_totalprice", 1).over(w), 2))
          .select("o_custkey", "o_orderkey", "running_spend", "prev_price")
          .orderBy("o_custkey", "o_orderkey")
      },
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend,
        | round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),2) AS prev_price
        |FROM orders WHERE o_custkey < 100 ORDER BY o_custkey, o_orderkey""".stripMargin),

    // ---- scalar functions (§2.9 — reference has none; full library here) ----
    "q23_string_functions" -> QDef(
      (s, d) => t(s, d, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 1, 8).as("prefix"),
          length(col("c_name")).as("name_len"),
          concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"))
        .orderBy("c_custkey"),
      """SELECT c_custkey, upper(c_name) AS uname, substr(c_name,1,8) AS prefix,
        | CAST(length(c_name) AS INT) AS name_len,
        | c_mktsegment || ':' || c_name AS tagged
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin),

    "q24_date_functions" -> QDef(
      (s, d) => t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("o_year"), month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
        .orderBy("o_year", "o_month"),
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, CAST(month(o_orderdate) AS INT) AS o_month,
        | count(*) AS n, round(sum(o_totalprice),2) AS rev
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""".stripMargin),

    "q25_null_semantics" -> QDef(
      (s, d) => t(s, d, "orders")
        .select(col("o_orderstatus"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio_or_null"))
        .groupBy("o_orderstatus", "prio_or_null")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("prio_or_null").asc_nulls_first),
      """SELECT o_orderstatus, nullif(o_orderpriority, '1-URGENT') AS prio_or_null, count(*) AS n
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_orderstatus, prio_or_null ASC NULLS FIRST""".stripMargin),

    "q26_subqueries" -> QDef(
      (s, d) => {
        val o = t(s, d, "orders")
        val avgP = o.agg(avg("o_totalprice").as("ap"))
        val bld = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        o.crossJoin(broadcast(avgP))
          .filter(col("o_totalprice") > col("ap") * 1.5)
          .join(bld, col("o_custkey") === col("c_custkey"), "left_semi")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin),

    "q27_rollup" -> QDef(
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),

    // PIVOT with an explicit value list (deterministic schema — dynamic
    // pivot would need a collect for the column set, which doesn't
    // distribute); sums are per-(status, priority) cells.
    "q35_pivot" -> QDef(
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(round(sum("o_totalprice"), 2))
        .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
        |  round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS "1-URGENT",
        |  round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS "2-HIGH",
        |  round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS "3-MEDIUM",
        |  round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END), 2) AS "4-NOT SPECIFIED",
        |  round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // UNPIVOT (stack) — q35's wide frame folded back to long form; null
    // cells are KEPT (matches SQL UNION-arm semantics; DuckDB's UNPIVOT
    // keyword drops them, so the oracle uses explicit arms).
    "q37_unpivot" -> QDef(
      (s, d) => {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val wide = t(s, d, "orders")
          .groupBy("o_orderstatus")
          .pivot("o_orderpriority", prios)
          .agg(round(sum("o_totalprice"), 2))
        val stackArgs = prios.map(p => s"'$p', `$p`").mkString(", ")
        wide.selectExpr("o_orderstatus",
            s"stack(${prios.size}, $stackArgs) AS (priority, total)")
          .orderBy("o_orderstatus", "priority")
      }, {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val arms = prios.map(p =>
          s"""SELECT o_orderstatus, '$p' AS priority, "$p" AS total FROM wide""")
          .mkString("\n  UNION ALL ")
        s"""WITH wide AS (
           |  SELECT o_orderstatus,
           |${prios.map(p => s"    round(sum(CASE WHEN o_orderpriority = '$p' THEN o_totalprice END), 2) AS \"$p\"").mkString(",\n")}
           |  FROM orders GROUP BY o_orderstatus)
           |$arms
           |ORDER BY o_orderstatus, priority""".stripMargin
      }),

    // CUBE — all four grouping combinations in one pass (q27 covers
    // ROLLUP's prefix subset).
    "q36_cube" -> QDef(
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    // Quantile sketch (GK approx_percentile), gated like q32: the exact
    // interpolated quantiles are hash-matched and `approx_ok` asserts the
    // sketch lands within 2% of the value range — the sketch is the
    // no-full-sort path at scale, the exact column is the harness.
    "q38_approx_quantiles" -> QDef(
      (s, d) => t(s, d, "events")
        .groupBy("event_type")
        .agg(expr("percentile(value, array(0.25D, 0.5D, 0.75D))").as("exact"),
          expr("approx_percentile(value, array(0.25D, 0.5D, 0.75D), 10000)").as("approx"),
          (max("value") - min("value")).as("rng"))
        .select(col("event_type"),
          round(element_at(col("exact"), 1), 4).as("p25"),
          round(element_at(col("exact"), 2), 4).as("p50"),
          round(element_at(col("exact"), 3), 4).as("p75"),
          expr("forall(zip_with(exact, approx, (e, a) -> abs(e - a) <= 0.02 * rng), x -> x)")
            .as("approx_ok"))
        .orderBy("event_type"),
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 4) AS p25,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.75), 4) AS p75,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    "q28_stats_aggregates" -> QDef(
      (s, d) => t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qe"),
          round(expr("percentile(l_quantity, 0.5D)"), 4).as("median_qty"))
        .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity),6) AS sd_qty,
        | round(var_samp(l_quantity),6) AS var_qty,
        | round(corr(l_quantity, l_extendedprice),6) AS corr_qe,
        | round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE),4) AS median_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- events: time + JSON (§2.9 passthrough / date functions) ----
    "q29_time_bucket_agg" -> QDef(
      (s, d) => t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
        .orderBy("hour", "event_type"),
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | round(sum(value),4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),

    "q30_sessionization" -> QDef(
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("prev_ts", lag("ts", 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
          .withColumn("sess_id", sum("new_sess").over(run))
          .groupBy("user_id", "sess_id")
          .agg(count(lit(1)).as("n_events"),
            min("ts").as("sess_start"), max("ts").as("sess_end"))
          .orderBy("user_id", "sess_id")
      },
      """WITH e AS (
        |  SELECT user_id, event_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |s AS (
        |  SELECT user_id, ts, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM m)
        |SELECT user_id, sess_id, count(*) AS n_events, min(ts) AS sess_start, max(ts) AS sess_end
        |FROM s GROUP BY 1, 2 ORDER BY user_id, sess_id""".stripMargin),

    // As-of join — the temporal join Spark has no native operator for
    // (reference has no temporal joins either; this is the pipeline
    // "attach latest context to each fact" op). Implemented the scalable
    // way: union both streams, ONE window pass per user carries the last
    // click forward — no per-key loops, no range-join explosion; at 100 TB
    // it is a single shuffle on user_id. Ties: a click at exactly the
    // purchase ts is eligible (sorts first), equal-ts clicks resolve to
    // the max event_id — the oracle's correlated top-1 mirrors both.
    "q33_asof_join" -> QDef(
      (s, d) => {
        val ev = t(s, d, "events").filter(col("event_type").isin("click", "purchase"))
          .withColumn("is_p", (col("event_type") === "purchase").cast("int"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("is_p"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("click_id", last(when(col("is_p") === 0, col("event_id")), ignoreNulls = true).over(w))
          .withColumn("click_ts", last(when(col("is_p") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("is_p") === 1)
          .select(col("event_id"), col("click_id"),
            (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("gap_us"))
          .orderBy("event_id")
      },
      """SELECT p.event_id,
        |  (SELECT c.event_id FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_id,
        |  (SELECT epoch_us(p.ts) - epoch_us(c.ts) FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
        |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS gap_us
        |FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin),

    // Range (interval) join — each signup counts the errors that same
    // user raised within the following 60 s. The naive form is an
    // inequality join (quadratic per user); the scale form used here bins
    // time into window-width buckets and equi-joins on (user, bin) with
    // the probe side exploded to its two candidate bins, then applies the
    // exact band predicate — candidate pairs are O(events in adjacent
    // bins), and the equi-join shuffles on (user_id, bin) like any other.
    "q34_range_join" -> QDef(
      (s, d) => {
        val W = 60L * 1000000L // 60 s in microseconds
        val ev = t(s, d, "events")
        val sg = ev.filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t0"))
        val er = ev.filter(col("event_type") === "error")
          .select(col("user_id"), unix_micros(col("ts")).as("t1"))
          .withColumn("bin", expr(s"t1 div $W"))
        val probes = sg.select(col("event_id"), col("user_id"), col("t0"),
          explode(array(expr(s"t0 div $W"), expr(s"t0 div $W") + 1)).as("bin"))
        val n = probes.join(er, Seq("user_id", "bin"))
          .filter(col("t1") >= col("t0") && col("t1") <= col("t0") + W)
          .groupBy("event_id").agg(count(lit(1)).as("n_errors"))
        sg.join(n, Seq("event_id"), "left")
          .select(col("event_id"), coalesce(col("n_errors"), lit(0L)).as("n_errors"))
          .orderBy("event_id")
      },
      """SELECT s.event_id,
        |  (SELECT count(*) FROM events e
        |   WHERE e.user_id = s.user_id AND e.event_type = 'error'
        |     AND epoch_us(e.ts) BETWEEN epoch_us(s.ts) AND epoch_us(s.ts) + 60000000) AS n_errors
        |FROM events s WHERE s.event_type = 'signup' ORDER BY s.event_id""".stripMargin),

    "q31_json_extract" -> QDef(
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 80)
        .orderBy("event_id"),
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 80
        |ORDER BY event_id""".stripMargin),

    // HyperLogLog++ approximate distinct — sketch estimates are
    // implementation-specific, so the sketch value itself can't be
    // oracle-matched against DuckDB. Instead the gated output asserts the
    // estimate's accuracy: `approx_ok` is computed Spark-side as
    // |approx − exact| ≤ 5%·exact and the oracle expects literal TRUE, so
    // a drifting sketch fails the hash gate. ApproxDistinctSpec bounds the
    // estimate in unit tests too. At 100 TB the sketch column is the
    // distinct-count that doesn't shuffle raw keys (partial sketches merge
    // map-side); the exact column here is the verification harness.
    "q32_approx_count_distinct" -> QDef(
      (s, d) => t(s, d, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("event_type"), col("n_users"),
          (abs(col("approx") - col("n_users")) <= col("n_users") * 0.05).as("approx_ok"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users, TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ntile quantile bucketing per partition key — the window form of
    // histogram/equi-depth binning. The (price, key) ORDER BY is a total
    // order, so bucket assignment is deterministic; the sort is
    // per-priority-partition, not global, so it scales like any windowed
    // aggregation (one shuffle on the partition key).
    "q39_window_ntile_quartiles" -> QDef(
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t(s, d, "orders")
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .groupBy(col("o_orderpriority"), col("quartile"))
          .agg(count(lit(1)).as("n"),
            round(min("o_totalprice"), 2).as("min_price"),
            round(max("o_totalprice"), 2).as("max_price"))
          .orderBy("o_orderpriority", "quartile")
      },
      """SELECT o_orderpriority, quartile, count(*) AS n,
        | round(min(o_totalprice), 2) AS min_price,
        | round(max(o_totalprice), 2) AS max_price
        |FROM (SELECT o_orderpriority, o_totalprice,
        |        CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |          ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |      FROM orders) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // percent_rank + cume_dist (the remaining rank-family windows beyond
    // rank/dense_rank/ntile): distribution position of each nation's
    // supplier count. Both functions are rational-valued from integer
    // rank/count inputs, so round(6) is engine-identical; the window
    // ordering carries a full tiebreak (count, nationkey) to make ranks
    // total-order deterministic.
    "q42_window_percent_rank" -> QDef(
      (s, d) => {
        val per = t(s, d, "supplier")
          .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
        val w = Window.orderBy(col("n_supp"), col("nk"))
        per.withColumn("pct_rank", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .orderBy("nk")
      },
      """SELECT nk, n_supp,
        |  round(percent_rank() OVER (ORDER BY n_supp, nk), 6) AS pct_rank,
        |  round(cume_dist() OVER (ORDER BY n_supp, nk), 6) AS cume
        |FROM (SELECT s_nationkey AS nk, count(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) t
        |ORDER BY nk""".stripMargin),

    // RANGE-framed window (value-based frame, not row-based): for each
    // order, how many same-priority orders fall within ±1000 of its
    // price. count() over a RANGE frame is peer-insensitive, so the
    // result is deterministic without a tiebreaker; the frame scan is
    // per-partition and sort-merge based — no all-pairs join.
    "q40_window_range_frame" -> QDef(
      (s, d) => t(s, d, "orders")
        .withColumn("n_near", expr(
          """count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
            |RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING)""".stripMargin))
        .select(col("o_orderkey"), col("o_orderpriority"), col("n_near"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_orderpriority,
        | count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |   RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS n_near
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // Arbitrary GROUPING SETS (completes the q27 rollup / q36 cube
    // family): the two single-column marginals plus the grand total in
    // ONE aggregation pass — Catalyst expands the sets into a single
    // Expand + HashAggregate, so the input is scanned once however many
    // sets are requested. grouping_id() disambiguates the null produced
    // by set expansion from a null group key (same convention DuckDB
    // uses), keeping the hash compare exact.
    "q41_grouping_sets" -> QDef(
      (s, d) => t(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first),
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin),

    // Executable relational DML end-to-end (reference update
    // `relational_engine/src/lib.rs:3842` / delete_rows `lib.rs:3954`):
    // copy the read-only sf customer table into a writable catalog table,
    // run UPDATE then DELETE through the NQL front door (TableDml's
    // copy-on-write rewrite), and aggregate the survivors. The oracle
    // replays the same DML as a pure SELECT (update = CASE projection,
    // delete = survivor predicate over the POST-update values — order
    // matters and is preserved). `IS NOT TRUE` mirrors SQL DELETE's 3VL:
    // a NULL predicate row is not deleted.
    "q43_update_delete" -> QDef(
      (s, d) => {
        val tbl = "cust_dml_" + java.util.UUID.randomUUID().toString.take(8)
        t(s, d, "customer").write.saveAsTable(tbl)
        try {
          graft.nql.Nql.execute(s, d,
            s"UPDATE $tbl SET c_acctbal = c_acctbal + 100.0 WHERE c_mktsegment = 'BUILDING'")
          graft.nql.Nql.execute(s, d, s"DELETE FROM $tbl WHERE c_acctbal < 0.0")
          // localCheckpoint materializes the survivors BEFORE the table is
          // dropped — the returned frame must outlive the temp table.
          s.table(tbl)
            .groupBy("c_mktsegment")
            .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
            .orderBy("c_mktsegment")
            .localCheckpoint()
        } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
      },
      """WITH upd AS (
        |  SELECT c_mktsegment,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100.0 ELSE c_acctbal END AS bal
        |  FROM customer)
        |SELECT c_mktsegment, count(*) AS n_cust, round(sum(bal), 2) AS total_bal
        |FROM upd WHERE (bal < 0.0) IS NOT TRUE
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // DML over a PARTITIONED table — the 100 TB path: the UPDATE's
    // predicate prunes the rewrite to the MACHINERY partition (every
    // other partition's files untouched — asserted in DdlDmlSpec); the
    // DELETE empties FURNITURE entirely, which drops the partition
    // instead of rewriting anything. Oracle replays both as a SELECT.
    "q44_partitioned_dml" -> QDef(
      (s, d) => {
        val tbl = "cust_pdml_" + java.util.UUID.randomUUID().toString.take(8)
        t(s, d, "customer").write.partitionBy("c_mktsegment").saveAsTable(tbl)
        try {
          graft.nql.Nql.execute(s, d,
            s"UPDATE $tbl SET c_acctbal = c_acctbal * 2.0 WHERE c_mktsegment = 'MACHINERY'")
          graft.nql.Nql.execute(s, d, s"DELETE FROM $tbl WHERE c_mktsegment = 'FURNITURE'")
          s.table(tbl)
            .groupBy("c_mktsegment")
            .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
            .orderBy("c_mktsegment")
            .localCheckpoint()
        } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
      },
      """WITH upd AS (
        |  SELECT c_mktsegment,
        |    CASE WHEN c_mktsegment = 'MACHINERY' THEN c_acctbal * 2.0 ELSE c_acctbal END AS bal
        |  FROM customer)
        |SELECT c_mktsegment, count(*) AS n_cust, round(sum(bal), 2) AS total_bal
        |FROM upd WHERE c_mktsegment <> 'FURNITURE'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  )
}
