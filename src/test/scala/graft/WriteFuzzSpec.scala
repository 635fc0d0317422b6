package graft

import graft.nql.{Nql, NqlExecException, NqlParseException}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative differential fuzz of the WRITE surface (round 10, VERDICT
  * r9 item 2): random NODE/EDGE/ENTITY CREATE/UPDATE/DELETE/CONNECT and
  * Cypher CREATE/MERGE/SET/DELETE sequences run through the full
  * parse→compile→execute→EntityStore path, against a driver-side model —
  * two plain Scala maps tracking the latest-wins log state — with
  * NODE LIST / NODE GET / EDGE LIST / NEIGHBORS / DEGREE / FIND NODES /
  * GRAPH COUNT parity asserted after every write. The reference's own
  * fuzz targets concentrate on write interleavings
  * (`fuzz/fuzz_targets/` graph/relational mutation targets); this is the
  * Spark-side analogue. 200+ seeded write statements across 16
  * sequences; the only accepted failures are typed domain errors the
  * model predicts (ENTITY UPDATE on a missing key).
  *
  * Modeled semantics (the overlay contract, NqlCompiler.allNodes /
  * allEdges):
  *  - store rows are latest-wins per key / per (src, dst, etype);
  *  - ANY store-touched node key masks its base row (a live row replaces
  *    it, a tombstone removes it);
  *  - a base edge is masked only while the identity's LATEST store
  *    record is a tombstone — a later re-create yields base + store
  *    duplicates (append-log semantics, multiset views);
  *  - overlay node label defaults to 'entity' ('node' spelling comes
  *    from NODE CREATE's explicit prop), name defaults to the key.
  */
class WriteFuzzSpec extends AnyFunSuite {
  import TestSpark._

  // ---- independently-composed base graph (raw parquet, not TpchGraph) --
  private def key(prefix: String, c: String) =
    concat(lit(prefix + ":"), col(c).cast("string"))

  private lazy val baseNodes: Map[String, (String, String)] = {
    val r = Tables(spark, sf, "region").select(key("region", "r_regionkey").as("key"),
      lit("region").as("label"), col("r_name").as("name"))
    val n = Tables(spark, sf, "nation").select(key("nation", "n_nationkey").as("key"),
      lit("nation").as("label"), col("n_name").as("name"))
    val c = Tables(spark, sf, "customer").select(key("customer", "c_custkey").as("key"),
      lit("customer").as("label"), col("c_name").as("name"))
    val s = Tables(spark, sf, "supplier").select(key("supplier", "s_suppkey").as("key"),
      lit("supplier").as("label"), col("s_name").as("name"))
    r.union(n).union(c).union(s).collect()
      .map(x => x.getString(0) -> (x.getString(1), x.getString(2))).toMap
  }

  private lazy val baseEdges: Seq[(String, String, String)] = {
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
    n2r.union(c2n).union(s2n).union(sr).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2))).toSeq
  }

  // ---- driver-side model of the append log --------------------------
  private final class Model {
    // latest record per node key: (props, deleted)
    var nodes = Map.empty[String, (Map[String, String], Boolean)]
    // latest record per edge identity: alive?
    var edges = Map.empty[(String, String, String), Boolean]

    def putNode(k: String, props: Map[String, String]): Unit = nodes += k -> (props, false)
    def delNode(k: String): Unit = nodes += k -> (Map.empty, true)
    def putEdge(id: (String, String, String)): Unit = edges += id -> true
    def delEdge(id: (String, String, String)): Unit = edges += id -> false

    def storeLiveProps(k: String): Option[Map[String, String]] =
      nodes.get(k).collect { case (p, false) => p }

    /** The allNodes overlay view: live store rows win, any store-touched
      * key masks its base row. */
    def viewNodes: Map[String, (String, String)] = {
      val live = nodes.collect { case (k, (p, false)) =>
        k -> (p.getOrElse("label", "entity"), p.getOrElse("name", k))
      }
      (baseNodes -- nodes.keySet) ++ live
    }

    /** The allEdges overlay view — a MULTISET (re-created base identity
      * appears twice: the unmasked base row plus the store row). */
    def viewEdges: Seq[(String, String, String)] =
      baseEdges.filterNot(id => edges.get(id).contains(false)) ++
        edges.collect { case (id, true) => id }

    def undirected: Seq[(String, String, String)] =
      viewEdges ++ viewEdges.map { case (s, d, t) => (d, s, t) }
  }

  // ---- statement alphabet -------------------------------------------
  private val freshKeys = (0 to 7).map(i => s"w:$i")
  private val baseKeyPool = Seq("nation:0", "nation:1", "nation:2", "region:0",
    "customer:1", "supplier:1")
  private val keyPool = freshKeys ++ baseKeyPool
  private val labels = Seq("alpha", "beta")
  private val etypes = Seq("link", "same_region", "rel")
  private val names = Seq("x1", "x2", "x3", "x4")

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private sealed trait Op
  private case class NodeCreateOp(k: String, label: String, name: Option[String]) extends Op
  private case class NodeDeleteOp(k: String) extends Op
  private case class EdgeCreateOp(a: String, b: String, t: String) extends Op
  private case class EdgeDeleteOp(a: String, b: String, t: String) extends Op
  private case class EntityCreateOp(k: String, props: Map[String, String]) extends Op
  private case class EntityUpdateOp(k: String, props: Map[String, String]) extends Op
  private case class EntityDeleteOp(k: String) extends Op
  private case class EntityConnectOp(a: String, b: String, t: String) extends Op
  private case class CyCreateOp(k: String, label: String, name: String) extends Op
  private case class CyMergeOp(k: String, label: String) extends Op
  private case class CySetOp(k: String, label: String, prop: String, v: String) extends Op
  private case class CyDeleteOp(k: String, label: String) extends Op
  private case class NodeBatchOp(items: Seq[(String, String, Option[String])]) extends Op
  private case class EdgeBatchOp(items: Seq[(String, String, String)]) extends Op
  private case class BatchDelOp(keys: Seq[String]) extends Op
  private case class BatchUpdOp(items: Seq[(String, String)]) extends Op

  private val opGen: Gen[Op] = {
    val k = Gen.oneOf(keyPool)
    val fresh = Gen.oneOf(freshKeys)
    val l = Gen.oneOf(labels)
    val t = Gen.oneOf(etypes)
    val nm = Gen.oneOf(names)
    Gen.frequency(
      4 -> (for { kk <- k; ll <- l; n <- Gen.option(nm) } yield NodeCreateOp(kk, ll, n)),
      2 -> k.map(NodeDeleteOp),
      4 -> (for { a <- k; b <- k; tt <- t } yield EdgeCreateOp(a, b, tt)),
      2 -> (for { a <- k; b <- k; tt <- t } yield EdgeDeleteOp(a, b, tt)),
      3 -> (for { kk <- fresh; n <- nm; tag <- Gen.oneOf("red", "blue") }
        yield EntityCreateOp(kk, Map("name" -> n, "tag" -> tag))),
      2 -> (for { kk <- k; n <- nm } yield EntityUpdateOp(kk, Map("name" -> n))),
      1 -> k.map(EntityDeleteOp),
      2 -> (for { a <- k; b <- k; tt <- t } yield EntityConnectOp(a, b, tt)),
      2 -> (for { kk <- fresh; ll <- l; n <- nm } yield CyCreateOp(kk, ll, n)),
      2 -> (for { kk <- k; ll <- l } yield CyMergeOp(kk, ll)),
      2 -> (for { kk <- k; ll <- l; n <- nm } yield CySetOp(kk, ll, "name", n)),
      1 -> (for { kk <- fresh; ll <- l } yield CyDeleteOp(kk, ll)),
      // batch forms: ONE log append for the whole item list, last
      // occurrence wins on same-batch duplicate identities
      2 -> (Gen.listOfN(3, for { kk <- k; ll <- l; n <- Gen.option(nm) } yield (kk, ll, n))
        .map(NodeBatchOp(_))),
      2 -> (Gen.listOfN(3, for { a <- k; b <- k; tt <- t } yield (a, b, tt))
        .map(EdgeBatchOp(_))),
      1 -> Gen.listOfN(2, k).map(BatchDelOp(_)),
      2 -> (Gen.listOfN(2, for { kk <- k; n <- nm } yield (kk, n)).map(BatchUpdOp(_))))
  }

  private def render(op: Op): String = op match {
    case NodeCreateOp(k, l, n) =>
      s"NODE CREATE '$k' LABEL '$l'" + n.fold("")(x => s" NAME '$x'")
    case NodeDeleteOp(k) => s"NODE DELETE '$k'"
    case EdgeCreateOp(a, b, t) => s"EDGE CREATE '$a' TO '$b' TYPE '$t'"
    case EdgeDeleteOp(a, b, t) => s"EDGE DELETE '$a' TO '$b' TYPE '$t'"
    case EntityCreateOp(k, p) =>
      s"ENTITY CREATE '$k' { " + p.toSeq.sorted.map { case (a, b) => s"$a: '$b'" }.mkString(", ") + " }"
    case EntityUpdateOp(k, p) =>
      s"ENTITY UPDATE '$k' SET " + p.toSeq.sorted.map { case (a, b) => s"$a = '$b'" }.mkString(", ")
    case EntityDeleteOp(k) => s"ENTITY DELETE '$k'"
    case EntityConnectOp(a, b, t) => s"ENTITY CONNECT '$a' -> '$b' : $t"
    case CyCreateOp(k, l, n) => s"CREATE (x:$l {key: '$k', name: '$n'})"
    case CyMergeOp(k, l) => s"MERGE (x:$l {key: '$k'})"
    case CySetOp(k, l, p, v) => s"MATCH (x:$l {key: '$k'}) SET x.$p = '$v'"
    case CyDeleteOp(k, l) => s"MATCH (x:$l {key: '$k'}) DELETE x"
    case NodeBatchOp(items) =>
      "NODE BATCH CREATE " + items.map { case (k, l, n) =>
        s"'$k' LABEL '$l'" + n.fold("")(x => s" NAME '$x'")
      }.mkString(" AND ")
    case EdgeBatchOp(items) =>
      "EDGE BATCH CREATE " + items.map { case (a, b, t) =>
        s"'$a' TO '$b' TYPE '$t'"
      }.mkString(" AND ")
    case BatchDelOp(keys) =>
      "BATCH DELETE NODES [" + keys.map(k => s"'$k'").mkString(", ") + "]"
    case BatchUpdOp(items) =>
      "BATCH UPDATE NODES [" + items.map { case (k, n) =>
        s"{id: '$k', name: '$n'}"
      }.mkString(", ") + "]"
  }

  /** Apply to the model; Some(msg) if the ENGINE must throw a typed error. */
  private def apply(m: Model, op: Op): Option[String] = op match {
    case NodeCreateOp(k, l, n) =>
      m.putNode(k, Map("label" -> l) ++ n.map("name" -> _)); None
    case NodeDeleteOp(k) => m.delNode(k); None
    case EdgeCreateOp(a, b, t) => m.putEdge((a, b, t)); None
    case EdgeDeleteOp(a, b, t) => m.delEdge((a, b, t)); None
    case EntityCreateOp(k, p) => m.putNode(k, p); None
    case EntityUpdateOp(k, p) =>
      // merge-update demands a LIVE STORE row (base-only nodes are not
      // entities; the engine's typed error names ENTITY CREATE)
      m.storeLiveProps(k) match {
        case Some(cur) => m.putNode(k, cur ++ p); None
        case None => Some("does not exist")
      }
    case EntityDeleteOp(k) => m.delNode(k); None
    case EntityConnectOp(a, b, t) => m.putEdge((a, b, t)); None
    case CyCreateOp(k, l, n) =>
      m.putNode(k, Map("label" -> l, "name" -> n)); None
    case CyMergeOp(k, l) =>
      if (!m.viewNodes.contains(k)) m.putNode(k, Map("label" -> l))
      None // matched → no-op
    case CySetOp(k, l, p, v) =>
      if (m.viewNodes.get(k).exists(_._1 == l)) {
        val (vl, vn) = m.viewNodes(k)
        val cur = m.storeLiveProps(k).getOrElse(Map("label" -> vl, "name" -> vn))
        m.putNode(k, cur + (p -> v))
      }
      None // unmatched → 0 updated, no error
    case CyDeleteOp(k, l) =>
      if (m.viewNodes.get(k).exists(_._1 == l)) m.delNode(k)
      None
    case NodeBatchOp(items) =>
      // one append; same-batch dup keys resolve last-wins (folding the
      // Scala map in statement order models exactly that)
      items.foreach { case (k, l, n) =>
        m.putNode(k, Map("label" -> l) ++ n.map("name" -> _))
      }
      None
    case EdgeBatchOp(items) =>
      items.foreach { case (a, b, t) => m.putEdge((a, b, t)) }
      None
    case BatchDelOp(keys) => keys.foreach(m.delNode); None
    case BatchUpdOp(items) =>
      // merge-update: EVERY id must have a live store row, or the whole
      // batch fails typed with no partial write
      if (items.forall { case (k, _) => m.storeLiveProps(k).isDefined }) {
        items.foreach { case (k, n) =>
          m.putNode(k, m.storeLiveProps(k).get + ("name" -> n))
        }
        None
      } else Some("do not exist")
  }

  // ---- read-back parity ---------------------------------------------
  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(r => (0 until r.length).map(r.get))

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    rows(df).sortBy(_.mkString("\u0001"))

  private def checkReads(m: Model, runS: String => DataFrame, ctx: String,
      touched: Seq[String]): Unit = {
    val view = m.viewNodes
    // NODE LIST — full overlay, unique keys, deterministic key order
    val wantNodes = view.toSeq.map { case (k, (l, n)) => Seq[Any](k, l, n) }.sortBy(_.head.toString)
    assert(rows(runS("NODE LIST")) == wantNodes, s"$ctx: NODE LIST diverged")
    // EDGE LIST — multiset (append-log dup semantics), order-insensitive
    val wantEdges = m.viewEdges.map { case (s, d, t) => Seq[Any](s, d, t) }.sortBy(_.mkString("\u0001"))
    assert(sortedRows(runS("EDGE LIST")) == wantEdges, s"$ctx: EDGE LIST diverged")
    // per touched key: GET, NEIGHBORS, DEGREE
    touched.distinct.foreach { k =>
      val wantGet = view.get(k).toSeq.map { case (l, n) => Seq[Any](k, l, n) }
      assert(rows(runS(s"NODE GET '$k'")) == wantGet, s"$ctx: NODE GET '$k' diverged")
      val nb = m.undirected.filter(_._1 == k).map { case (_, d, t) => Seq[Any](d, t) }
        .sortBy(_.mkString("\u0001"))
      assert(sortedRows(runS(s"NEIGHBORS '$k'")) == nb, s"$ctx: NEIGHBORS '$k' diverged")
      val deg = m.undirected.count(_._1 == k).toLong
      val wantDeg = if (deg == 0) Seq.empty else Seq(Seq[Any](k, deg))
      assert(rows(runS(s"DEGREE '$k'")) == wantDeg, s"$ctx: DEGREE '$k' diverged")
    }
    // FIND NODES per overlay label + GRAPH COUNT
    labels.foreach { l =>
      val want = view.collect { case (k, (`l`, _)) => Seq[Any](k) }.toSeq.sortBy(_.head.toString)
      assert(rows(runS(s"FIND NODES $l RETURN key")) == want, s"$ctx: FIND NODES $l diverged")
    }
    assert(rows(runS("GRAPH COUNT NODES")) == Seq(Seq[Any](view.size.toLong)),
      s"$ctx: GRAPH COUNT NODES diverged")
    etypes.foreach { t =>
      val n = m.viewEdges.count(_._3 == t).toLong
      assert(rows(runS(s"GRAPH COUNT EDGES TYPE '$t'")) == Seq(Seq[Any](n)),
        s"$ctx: GRAPH COUNT EDGES '$t' diverged")
    }
  }

  test("write-surface differential: 16 seeded sequences, 224 writes, model parity") {
    var totalWrites = 0
    for (seq <- 1 to 16) {
      val store = new graft.unified.EntityStore(spark,
        java.nio.file.Files.createTempDirectory(s"write-fuzz-$seq").toString)
      def runS(q: String) = Nql.execute(spark, sf, store, q)
      val m = new Model
      val touched = scala.collection.mutable.ArrayBuffer.empty[String]
      for (step <- 1 to 14) {
        val op = gen(opGen, 9000L + seq * 100 + step)
        val stmt = render(op)
        val expectErr = apply(m, op)
        totalWrites += 1
        expectErr match {
          case Some(frag) =>
            val e = intercept[NqlExecException](runS(stmt).collect())
            assert(e.getMessage.contains(frag), s"<$stmt> wrong error: ${e.getMessage}")
          case None =>
            try runS(stmt).collect()
            catch {
              case e: Throwable => fail(s"<$stmt> unexpectedly failed: " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}")
            }
        }
        op match {
          case NodeCreateOp(k, _, _) => touched += k
          case NodeDeleteOp(k) => touched += k
          case EdgeCreateOp(a, b, _) => touched += a += b
          case EdgeDeleteOp(a, b, _) => touched += a += b
          case EntityCreateOp(k, _) => touched += k
          case EntityUpdateOp(k, _) => touched += k
          case EntityDeleteOp(k) => touched += k
          case EntityConnectOp(a, b, _) => touched += a += b
          case CyCreateOp(k, _, _) => touched += k
          case CyMergeOp(k, _) => touched += k
          case CySetOp(k, _, _, _) => touched += k
          case CyDeleteOp(k, _) => touched += k
          case NodeBatchOp(items) => items.foreach(touched += _._1)
          case EdgeBatchOp(items) => items.foreach { case (a, b, _) => touched += a += b }
          case BatchDelOp(keys) => touched ++= keys
          case BatchUpdOp(items) => items.foreach(touched += _._1)
        }
        // cheap incremental probe: the most recently touched key
        val k = touched.last
        val wantGet = m.viewNodes.get(k).toSeq.map { case (l, n) => Seq[Any](k, l, n) }
        assert(rows(runS(s"NODE GET '$k'")) == wantGet,
          s"seq $seq step $step <$stmt>: NODE GET '$k' diverged")
      }
      checkReads(m, runS, s"seq $seq end", touched.toSeq)
    }
    assert(totalWrites >= 200, s"fuzz must cover 200+ writes, ran $totalWrites")
  }

  test("write-surface malformed statements raise typed errors only") {
    val store = new graft.unified.EntityStore(spark,
      java.nio.file.Files.createTempDirectory("write-fuzz-bad").toString)
    def runS(q: String) = Nql.execute(spark, sf, store, q)
    val bad = Seq(
      "NODE CREATE", "NODE DELETE", "NODE DELETE 'a' 'b'",
      "EDGE CREATE 'a'", "EDGE CREATE 'a' TO", "EDGE DELETE 'a' 'b'",
      "ENTITY CREATE", "ENTITY UPDATE 'missing:1' SET name = 'x'",
      "ENTITY UPDATE 'a'", "ENTITY CONNECT 'a'",
      "CREATE (x:l)", "MERGE (x)")
    bad.foreach { q =>
      try { runS(q).collect(); fail(s"<$q> should have raised a typed error") }
      catch {
        case _: NqlParseException | _: NqlExecException => ()
        case e: Throwable => fail(s"<$q> leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }
}
