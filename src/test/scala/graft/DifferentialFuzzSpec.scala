package graft

import graft.nql.{Nql, NqlExecException, NqlParseException}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative DIFFERENTIAL fuzz at the execute level (round 9, VERDICT r8
  * item 6): random in-grammar NQL statements run through the full
  * parse→compile→execute path AND against an independently-composed
  * DataFrame oracle built here from the raw parquet tables (deliberately
  * NOT via TpchGraph/NqlCompiler, so an engine bug cannot cancel out of
  * both sides). 200+ seeded statements across 8 families; every result
  * must match row-for-row and every failure must be a typed domain error.
  *
  * The SIMILAR oracle recomputes cosine/dot/l2 with Spark's built-in
  * higher-order `aggregate`/`zip_with` fold — same sequential double
  * accumulation order as the custom codegen Expressions, so scores are
  * bit-identical, exercised through a completely different code path.
  */
class DifferentialFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private def run(q: String) = Nql.execute(spark, sf, q)

  // ---- independently-composed property graph --------------------------
  private def key(prefix: String, c: String) =
    concat(lit(prefix + ":"), col(c).cast("string"))

  private lazy val oNodes: DataFrame = {
    val r = Tables(spark, sf, "region").select(key("region", "r_regionkey").as("key"),
      lit("region").as("label"), col("r_name").as("name"))
    val n = Tables(spark, sf, "nation").select(key("nation", "n_nationkey").as("key"),
      lit("nation").as("label"), col("n_name").as("name"))
    val c = Tables(spark, sf, "customer").select(key("customer", "c_custkey").as("key"),
      lit("customer").as("label"), col("c_name").as("name"))
    val s = Tables(spark, sf, "supplier").select(key("supplier", "s_suppkey").as("key"),
      lit("supplier").as("label"), col("s_name").as("name"))
    r.union(n).union(c).union(s).cache()
  }

  private lazy val oEdges: DataFrame = {
    val n2r = Tables(spark, sf, "nation").select(key("nation", "n_nationkey").as("src"),
      key("region", "n_regionkey").as("dst"), lit("in_region").as("etype"))
    val c2n = Tables(spark, sf, "customer").select(key("customer", "c_custkey").as("src"),
      key("nation", "c_nationkey").as("dst"), lit("in_nation").as("etype"))
    val s2n = Tables(spark, sf, "supplier").select(key("supplier", "s_suppkey").as("src"),
      key("nation", "s_nationkey").as("dst"), lit("in_nation").as("etype"))
    val nat = Tables(spark, sf, "nation")
    val sr = nat.select(col("n_nationkey").as("ka"), col("n_regionkey").as("ra"))
      .join(nat.select(col("n_nationkey").as("kb"), col("n_regionkey").as("rb")),
        col("ra") === col("rb") && col("ka") < col("kb"))
      .select(concat(lit("nation:"), col("ka").cast("string")).as("src"),
        concat(lit("nation:"), col("kb").cast("string")).as("dst"),
        lit("same_region").as("etype"))
    n2r.union(c2n).union(s2n).union(sr).cache()
  }

  private lazy val oUndirected: DataFrame =
    oEdges.union(oEdges.select(col("dst").as("src"), col("src").as("dst"), col("etype")))

  // ---- comparison -----------------------------------------------------
  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(r.get))

  private def assertSame(stmt: String, got: DataFrame, want: DataFrame): Unit = {
    val g = rowsOf(got)
    val w = rowsOf(want)
    assert(g == w, s"<$stmt>\n engine: ${g.take(8)}…(${g.size})\n oracle: ${w.take(8)}…(${w.size})")
  }

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val labelGen = Gen.option(Gen.oneOf("region", "nation", "customer", "supplier", "ghost"))
  private val etypeGen = Gen.option(Gen.oneOf("in_region", "in_nation", "same_region", "ghost"))
  private val keyGen = Gen.oneOf("nation:0", "nation:7", "nation:24", "region:0",
    "region:4", "customer:1", "supplier:1", "nosuch:9")
  private val limGen = Gen.option(Gen.choose(1, 40))
  private val offGen = Gen.option(Gen.choose(0, 10))

  test("NODE LIST differential: 40 random label/limit/offset combinations") {
    (1 to 40).foreach { k =>
      val (label, lim, off) =
        gen(for { l <- labelGen; n <- limGen; o <- offGen } yield (l, n, o), 100L + k)
      val stmt = "NODE LIST" + label.fold("")(l => s" LABEL '$l'") +
        lim.fold("")(n => s" LIMIT $n") + off.fold("")(o => s" OFFSET $o")
      val base = label.fold(oNodes)(l => oNodes.filter(col("label") === l)).orderBy("key")
      val o1 = off.fold(base)(base.offset)
      assertSame(stmt, run(stmt), lim.fold(o1)(o1.limit))
    }
  }

  test("EDGE LIST differential: 30 random type/limit/offset combinations") {
    (1 to 30).foreach { k =>
      val (etype, lim, off) =
        gen(for { t <- etypeGen; n <- limGen; o <- offGen } yield (t, n, o), 200L + k)
      val stmt = "EDGE LIST" + etype.fold("")(t => s" TYPE '$t'") +
        lim.fold("")(n => s" LIMIT $n") + off.fold("")(o => s" OFFSET $o")
      val base = etype.fold(oEdges)(t => oEdges.filter(col("etype") === t)).orderBy("src", "dst")
      val o1 = off.fold(base)(base.offset)
      assertSame(stmt, run(stmt), lim.fold(o1)(o1.limit))
    }
  }

  test("NEIGHBORS differential: 30 random key/type/limit combinations") {
    (1 to 30).foreach { k =>
      val (nk, etype, lim) =
        gen(for { a <- keyGen; t <- etypeGen; n <- limGen } yield (a, t, n), 300L + k)
      val stmt = s"NEIGHBORS '$nk'" + etype.fold("")(t => s" TYPE '$t'") +
        lim.fold("")(n => s" LIMIT $n")
      val base = oUndirected.filter(col("src") === nk)
        .select(col("dst").as("neighbor"), col("etype"))
      val filt = etype.fold(base)(t => base.filter(col("etype") === t)).orderBy("neighbor")
      assertSame(stmt, run(stmt), lim.fold(filt)(filt.limit))
    }
  }

  test("DEGREE differential: 20 random keys (existing + missing)") {
    (1 to 20).foreach { k =>
      val nk = gen(keyGen, 400L + k)
      val stmt = s"DEGREE '$nk'"
      val want = oUndirected.filter(col("src") === nk)
        .groupBy(col("src").as("key")).agg(count(lit(1)).as("degree"))
      assertSame(stmt, run(stmt), want)
    }
  }

  test("GRAPH COUNT differential: 20 random node/edge count statements") {
    (1 to 20).foreach { k =>
      val (overEdges, label, etype) =
        gen(for { e <- Gen.oneOf(true, false); l <- labelGen; t <- etypeGen } yield (e, l, t), 500L + k)
      if (overEdges) {
        val stmt = "GRAPH COUNT EDGES" + etype.fold("")(t => s" TYPE '$t'")
        val want = etype.fold(oEdges)(t => oEdges.filter(col("etype") === t))
          .agg(count(lit(1)).as("n_edges"))
        assertSame(stmt, run(stmt), want)
      } else {
        val stmt = "GRAPH COUNT NODES" + label.fold("")(l => s" LABEL '$l'")
        val want = label.fold(oNodes)(l => oNodes.filter(col("label") === l))
          .agg(count(lit(1)).as("n_nodes"))
        assertSame(stmt, run(stmt), want)
      }
    }
  }

  test("GRAPH AGGREGATE differential: 30 random func/label/where combinations") {
    val c = Tables(spark, sf, "customer").select(key("customer", "c_custkey").as("key"),
      lit("customer").as("label"), col("c_acctbal").cast("double").as("value"))
    val s = Tables(spark, sf, "supplier").select(key("supplier", "s_suppkey").as("key"),
      lit("supplier").as("label"), col("s_acctbal").cast("double").as("value"))
    val univ = c.union(s).cache()
    (1 to 30).foreach { k =>
      val (func, label, thr) = gen(for {
        f <- Gen.oneOf("SUM", "AVG", "MIN", "MAX", "COUNT")
        l <- Gen.option(Gen.oneOf("customer", "supplier"))
        t <- Gen.option(Gen.oneOf(0, 1000, 5000))
      } yield (f, l, t), 600L + k)
      val stmt = s"GRAPH AGGREGATE $func 'acctbal' NODES" +
        label.fold("")(l => s" LABEL '$l'") + thr.fold("")(t => s" WHERE value > $t")
      val f0 = label.fold(univ)(l => univ.filter(col("label") === l))
      val f1 = thr.fold(f0)(t => f0.filter(col("value") > t))
      val q = f1.withColumn("q", round(col("value") * 100).cast("long"))
      val aggCol = func match {
        case "SUM" => sum(col("q")) / 100.0
        case "AVG" => sum(col("q")) / 100.0 / count(lit(1))
        case "MIN" => min(col("value"))
        case "MAX" => max(col("value"))
        case _     => count(col("value")).cast("double")
      }
      val want = q.agg(round(aggCol, 4).as("value"))
        .select(lit(func.toLowerCase).as("func"), lit("acctbal").as("prop"), col("value"))
      assertSame(stmt, run(stmt), want)
    }
  }

  test("FIND NODES differential: 40 random label/where/limit combinations") {
    (1 to 40).foreach { k =>
      val (label, whereOpt, lim, retKey) = gen(for {
        l <- labelGen
        w <- Gen.option(for {
          c <- Gen.oneOf("key", "name")
          op <- Gen.oneOf(">", "<", ">=", "<=", "=", "<>")
          v <- Gen.oneOf("nation:5", "m", "CUSTOMER", "Customer#000000010")
        } yield (c, op, v))
        n <- limGen
        r <- Gen.oneOf(true, false)
      } yield (l, w, n, r), 700L + k)
      val stmt = "FIND NODES" + label.fold("")(l => s" $l") +
        whereOpt.fold("") { case (c, op, v) => s" WHERE $c $op '$v'" } +
        (if (retKey) " RETURN key" else "") +
        lim.fold("")(n => s" LIMIT $n")
      val f0 = label.fold(oNodes)(l => oNodes.filter(col("label") === l))
      val f1 = whereOpt.fold(f0) { case (c, op, v) =>
        f0.filter(op match {
          case ">" => col(c) > v
          case "<" => col(c) < v
          case ">=" => col(c) >= v
          case "<=" => col(c) <= v
          case "=" => col(c) === v
          case _ => col(c) =!= v
        })
      }
      val f2 = lim.fold(f1.orderBy("key"))(f1.orderBy("key").limit)
      val want = if (retKey) f2.select("key") else f2.select("key", "label", "name")
      assertSame(stmt, run(stmt), want)
    }
  }

  test("SIMILAR differential: 30 random key/metric/limit against a fold oracle") {
    val emb = Tables(spark, sf, "embeddings")
      .select(concat(lit("vec:"), col("vec_id").cast("string")).as("key"),
        col("embedding")).cache()
    (1 to 30).foreach { k =>
      val (vid, metric, lim) = gen(for {
        v <- Gen.choose(0, 30)
        m <- Gen.oneOf("COSINE", "EUCLIDEAN", "DOT")
        n <- Gen.choose(1, 15)
      } yield (v, m, n), 800L + k)
      val qk = s"vec:$vid"
      val stmt = s"SIMILAR '$qk' METRIC $metric LIMIT $lim"
      val q = emb.filter(col("key") === qk).select(col("embedding").as("qv"))
      val scored = emb.filter(col("key") =!= qk).crossJoin(broadcast(q))
      val scoreExpr = metric match {
        case "COSINE" => expr(
          """CASE WHEN aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) = 0D
            |       OR aggregate(qv, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) = 0D THEN 0D
            |  ELSE aggregate(zip_with(embedding, qv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)
            |       / (sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
            |          * sqrt(aggregate(qv, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END""".stripMargin)
        case "DOT" => expr(
          "aggregate(zip_with(embedding, qv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)")
        case _ => expr(
          """sqrt(aggregate(zip_with(embedding, qv,
            |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
            |  0D, (a, v) -> a + v))""".stripMargin)
      }
      val base = scored.select(col("key"), round(scoreExpr, 4).as("score"))
      val want = (if (metric == "EUCLIDEAN") base.orderBy(asc("score"), col("key"))
                  else base.orderBy(desc("score"), col("key"))).limit(lim)
      assertSame(stmt, run(stmt), want)
    }
  }

  test("malformed in-grammar-adjacent statements raise typed errors only") {
    // "NODE LIST LIMIT -1" is a real catch: before round 9 a negative
    // grammar int reached Spark's limit() and leaked AnalysisException
    val bad = Seq(
      "NODE LIST LIMIT -1", "NODE LIST OFFSET -2", "NEIGHBORS", "DEGREE",
      "GRAPH AGGREGATE SUM 'nope' NODES", "GRAPH AGGREGATE SUM 'weight' NODES",
      "FIND NODES WHERE flavor = 'x'", "EDGE LIST OFFSET x",
      "GRAPH COUNT NODES LABEL", "SIMILAR 'nation:0' LIMIT 3")
    bad.foreach { q =>
      try { run(q).collect(); fail(s"<$q> should have raised a typed error") }
      catch {
        case _: NqlParseException | _: NqlExecException => ()
        case e: Throwable => fail(s"<$q> leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
