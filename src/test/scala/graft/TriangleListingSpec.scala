package graft

import graft.graph.Algorithms
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactness of the degree-ordered triangle listing
  * (Algorithms.triangleTriples and its two scatter views) against a
  * driver-side brute-force enumeration on seeded random graphs. The
  * orientation argument — each triangle is listed exactly once, at its
  * (deg, key)-minimal corner — must hold on arbitrary topology, not
  * just the bundled TPC-H hierarchy, because the GRAPH CLUSTERING /
  * TRANSITIVITY statement paths run it on user overlay graphs.
  */
class TriangleListingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def check(raw: Set[(String, String)]): Unit = {
    // triangleTriples requires the u<v-canonical simple edge frame
    val edges = raw.map { case (a, b) => if (a < b) (a, b) else (b, a) }
    val e0 = edges.toSeq.toDF("u", "v")
    // brute force: per-node and per-edge triangle counts
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val tris = for {
      (u, v) <- edges.toSeq
      w <- adj(u) intersect adj(v)
    } yield Set(u, v, w) // each triangle appears 3× (once per side)
    val uniq = tris.distinct
    val nodeExp = uniq.flatten.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val edgeExp = uniq.flatMap(t => t.subsets(2).map(_.toSeq.sorted))
      .groupBy(identity).map { case (k, xs) => (k(0), k(1)) -> xs.size.toLong }
      .filter { case (e, _) => edges.contains(e) || edges.contains(e.swap) }

    val triples = Algorithms.triangleTriples(e0).collect()
      .map(r => Set(r.getString(0), r.getString(1), r.getString(2)))
    assert(triples.length == triples.distinct.length, "a triangle was listed twice")
    assert(triples.toSet == uniq.toSet,
      s"listing mismatch: missing=${uniq.toSet -- triples.toSet} extra=${triples.toSet -- uniq.toSet}")

    val nodeGot = Algorithms.localTriangleCounts(e0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nodeGot == nodeExp, s"per-node counts differ: got $nodeGot want $nodeExp")

    val edgeGot = Algorithms.edgeSupport(e0).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(edgeGot == edgeExp.toMap, s"per-edge support differs: got $edgeGot want $edgeExp")
  }

  test("oriented listing matches brute force on seeded random graphs") {
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 6) {
      val n = 12 + trial * 3
      val nodes = (0 until n).map(i => f"n$i%02d")
      val edges = (for {
        i <- 0 until n; j <- i + 1 until n
        if rnd.nextDouble() < 0.22
      } yield (nodes(i), nodes(j))).toSet
      check(edges)
    }
  }

  test("hub star plus one closing rim edge: exactly one triangle at every corner") {
    // the g38 failure shape: an SF-linear hub; the oriented join must
    // emit O(1) wedges at the hub, and counts stay exact
    val hub = (1 to 40).map(i => ("hub", f"leaf$i%02d")).toSet
    check(hub + (("leaf01", "leaf02")))
  }

  test("clique K6: every node in C(5,2)=10 triangles, every edge supports 4") {
    val ns = (1 to 6).map(i => s"k$i")
    val edges = (for (i <- ns.indices; j <- i + 1 until ns.size) yield (ns(i), ns(j))).toSet
    check(edges)
  }

  test("triangle-free bipartite graph lists nothing") {
    val edges = (for (i <- 1 to 4; j <- 1 to 4) yield (s"a$i", s"b$j")).toSet
    assert(Algorithms.triangleTriples(edges.toSeq.toDF("u", "v")).count() == 0)
  }

  test("GRAPH TRIANGLES statement differential: random overlay graphs with dup/reversed edges") {
    // End-to-end through the statement VIEW composition (EntityStore
    // overlay union -> same_region slice -> canonicalize+distinct ->
    // oriented listing) against a naive 3-way-join oracle composed here
    // on the same slice. Generated edges deliberately include duplicates
    // and reversed duplicates — the simple-graph distinct must absorb
    // them in both engines.
    val rnd = new scala.util.Random(0x9A5CADE5L)
    for (trial <- 1 to 4) {
      val store = new graft.unified.EntityStore(spark,
        java.nio.file.Files.createTempDirectory(s"tri-fuzz-$trial").toString)
      def runS(q: String) = graft.nql.Nql.execute(spark, TestSpark.sf, store, q)
      val ns = (0 until 8).map(i => f"f$trial:$i")
      ns.foreach(k => runS(s"NODE CREATE '$k' LABEL 'fz' NAME '$k'"))
      val base = for {
        i <- ns.indices; j <- i + 1 until ns.size
        if rnd.nextDouble() < 0.35
      } yield (ns(i), ns(j))
      val withDups = base ++ base.filter(_ => rnd.nextBoolean()).map(_.swap) ++
        base.take(2) // exact duplicates
      withDups.foreach { case (a, b) => runS(s"EDGE CREATE '$a' TO '$b' TYPE 'same_region'") }

      // naive oracle on the canonical distinct slice: base nation cliques
      // plus the overlay, straight 3-way join (independent of the engine)
      val baseSr = TestSpark.spark.read
        .parquet(s"${TestSpark.sf}/nation.parquet")
        .select(col("n_nationkey").as("ka"), col("n_regionkey").as("ra"))
      val cliques = baseSr
        .join(baseSr.select(col("ka").as("kb"), col("ra").as("rb")),
          col("ra") === col("rb") && col("ka") < col("kb"))
        .select(concat(lit("nation:"), col("ka").cast("string")).as("src"),
          concat(lit("nation:"), col("kb").cast("string")).as("dst"))
      val overlay = withDups.toDF("src", "dst")
      val slice = cliques.unionByName(overlay)
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")).distinct()
      val want = slice.select(col("u").as("a"), col("v").as("b"))
        .join(slice.select(col("u").as("b"), col("v").as("c")), Seq("b"))
        .join(slice.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("key"))
        .groupBy("key").agg(count(lit(1)).as("n_triangles"))
        .orderBy("key")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      // the oracle composes the same_region slice, so exercise the
      // statement's EDGE TYPE filter path (the default is whole-graph
      // per the reference TriangleConfig; NqlSpec pins that scope)
      val got = runS("GRAPH TRIANGLES EDGE TYPE 'same_region'")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(got == want, s"trial $trial: engine $got vs oracle $want")
    }
  }

  test("ktruss cascade: a triangle strip peels over multiple rounds, K4 survives") {
    // Strip of 6 triangles sharing sides: n0-n1-n2, n1-n2-n3, ... Interior
    // sides have support 2, the two boundary sides support 1, so 4-truss
    // (sup >= 2) peeling CASCADES inward one triangle per round — the
    // shape that catches an under-counted round bound or a support
    // formula that only holds on the first pass. Plus a disjoint K4,
    // where every edge closes 2 triangles and must survive unconditionally.
    val strip = (0 to 5).flatMap(i =>
      Seq((s"n$i", s"n${i + 1}"), (s"n$i", s"n${i + 2}"), (s"n${i + 1}", s"n${i + 2}")))
    val k4ns = (1 to 4).map(i => s"q$i")
    val k4 = for (i <- k4ns.indices; j <- i + 1 until k4ns.size) yield (k4ns(i), k4ns(j))
    val e0 = (strip ++ k4).distinct
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toDF("u", "v")
    // enough rounds: whole strip gone, K4 intact
    val kept = Algorithms.ktruss(e0, k = 4, rounds = 6).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == k4.toSet, s"4-truss must be exactly the K4, got $kept")
    // too few rounds for the cascade: the fixpoint probe must throw, not
    // return a half-peeled truss that an identically-unrolled oracle
    // would silently match
    val ex = intercept[IllegalStateException] {
      Algorithms.ktruss(e0, k = 4, rounds = 1).collect()
    }
    assert(ex.getMessage.contains("fixpoint"))
  }
}
