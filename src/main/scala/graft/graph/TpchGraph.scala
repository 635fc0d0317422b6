package graft.graph

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Property-graph view over the driver testdata (SURVEY.md §1.3 model:
  * `nodes(key, label, name)` + directed typed `edges(src, dst, etype)`),
  * derived from the TPC-H hierarchy:
  *
  *   customer:{k} --in_nation-->  nation:{k} --in_region--> region:{k}
  *   supplier:{k} --in_nation-->  nation:{k}
  *   nation:{a}  --same_region--  nation:{b}   (undirected clique per region)
  *
  * This yields five trees (one per region) plus five 5-cliques — enough
  * structure for BFS, shortest paths, components, triangles and PageRank
  * with deterministic, SQL-checkable answers.
  */
object TpchGraph {
  private def k(prefix: String, c: String) = concat(lit(prefix + ":"), col(c).cast("string"))

  /** The graph frames derive from TPC-H *dimension* tables (≤ tens of MB
    * even at sf100), and the iterative algorithms re-reference them every
    * round — cache() so a 10-iteration PageRank does 1 scan, not 10.
    * Spark dedups cache entries by canonicalized plan, so repeated calls
    * share one in-memory copy.
    */
  def nodes(s: SparkSession, d: String): DataFrame = nodesUncached(s, d).cache()
  def treeEdges(s: SparkSession, d: String): DataFrame = treeEdgesUncached(s, d).cache()
  def sameRegionEdges(s: SparkSession, d: String): DataFrame = sameRegionEdgesUncached(s, d).cache()

  private def nodesUncached(s: SparkSession, d: String): DataFrame = {
    val r = Tables(s, d, "region").select(k("region", "r_regionkey").as("key"), lit("region").as("label"), col("r_name").as("name"))
    val n = Tables(s, d, "nation").select(k("nation", "n_nationkey").as("key"), lit("nation").as("label"), col("n_name").as("name"))
    val c = Tables(s, d, "customer").select(k("customer", "c_custkey").as("key"), lit("customer").as("label"), col("c_name").as("name"))
    val p = Tables(s, d, "supplier").select(k("supplier", "s_suppkey").as("key"), lit("supplier").as("label"), col("s_name").as("name"))
    r.union(n).union(c).union(p)
  }

  /** Directed tree edges (child → parent). */
  private def treeEdgesUncached(s: SparkSession, d: String): DataFrame = {
    val n2r = Tables(s, d, "nation")
      .select(k("nation", "n_nationkey").as("src"), k("region", "n_regionkey").as("dst"), lit("in_region").as("etype"))
    val c2n = Tables(s, d, "customer")
      .select(k("customer", "c_custkey").as("src"), k("nation", "c_nationkey").as("dst"), lit("in_nation").as("etype"))
    val s2n = Tables(s, d, "supplier")
      .select(k("supplier", "s_suppkey").as("src"), k("nation", "s_nationkey").as("dst"), lit("in_nation").as("etype"))
    n2r.union(c2n).union(s2n)
  }

  /** Undirected same-region nation cliques, stored once with src < dst. */
  private def sameRegionEdgesUncached(s: SparkSession, d: String): DataFrame = {
    val n = Tables(s, d, "nation")
    val a = n.select(col("n_nationkey").as("ka"), col("n_regionkey").as("ra"))
    val b = n.select(col("n_nationkey").as("kb"), col("n_regionkey").as("rb"))
    a.join(b, col("ra") === col("rb") && col("ka") < col("kb"))
      .select(concat(lit("nation:"), col("ka").cast("string")).as("src"),
        concat(lit("nation:"), col("kb").cast("string")).as("dst"),
        lit("same_region").as("etype"))
  }

  /** All edges (tree + cliques). */
  def edges(s: SparkSession, d: String): DataFrame =
    treeEdges(s, d).union(sameRegionEdges(s, d))

  /** Directed ring over each region's nations (n₀→n₁→…→n₀), giving the
    * directed graph nontrivial SCCs (one 5-nation cycle per region).
    */
  def nationCycleEdges(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_regionkey").orderBy("n_nationkey")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy("n_regionkey")
    Tables(s, d, "nation")
      .withColumn("nxt", lead("n_nationkey", 1).over(w))
      .withColumn("fst", min("n_nationkey").over(wAll))
      .select(k("nation", "n_nationkey").as("src"),
        concat(lit("nation:"), coalesce(col("nxt"), col("fst")).cast("string")).as("dst"),
        lit("cycle").as("etype"))
  }

  /** Symmetric closure for undirected traversal. */
  def undirected(e: DataFrame): DataFrame =
    e.select(col("src"), col("dst"), col("etype"))
      .union(e.select(col("dst").as("src"), col("src").as("dst"), col("etype")))

  /** Canonical distinct SIMPLE-graph frame — columns `(u, v)` with
    * u < v in STRING order (the order [[Algorithms.triangleTriples]]'s
    * closure check canonicalizes on; numeric key order "nation:2" >
    * "nation:10" silently drops triangles), duplicates and self-loops
    * removed. Memoized per (session, dir, scope) and cache()d like the
    * other dimension-derived frames: g07/g36/g38/g47/g51 and the
    * no-overlay GRAPH TRIANGLES / CLUSTERING / TRANSITIVITY statement
    * fronts are all views over the SAME frame, and before round 12 each
    * caller re-ran its own least/greatest+distinct exchange per query
    * (VERDICT r11 carried item 2). Overlay-aware statement paths (a
    * live entity store) must NOT use this — they canonicalize their own
    * mutable edge view.
    */
  def canonicalEdges(s: SparkSession, d: String): DataFrame =
    canonOf(s, d, "all", edges(s, d))

  /** g07's scope: the same_region cliques only (see [[canonicalEdges]]). */
  def canonicalSameRegionEdges(s: SparkSession, d: String): DataFrame =
    canonOf(s, d, "same_region", sameRegionEdges(s, d))

  private val canonMemo =
    graft.Memo.artifact[(SparkSession, String, String), DataFrame]()
  private def canonOf(s: SparkSession, d: String, scope: String, e: DataFrame): DataFrame =
    canonMemo.getOrElseUpdate((s, d, scope),
      Algorithms.memo(e
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .filter(col("u") < col("v")) // drop self-loops: simple-graph precondition
        .distinct()))
}

/** Iterative-join graph algorithms with fixed iteration counts (no
  * driver-side convergence loop) so results are deterministic and the
  * driver's oracle can unroll the same number of steps in SQL.
  *
  * Lineage policy (measured, see round-3 PERF.md): an accumulator that the
  * next iteration references twice (union + join) doubles the logical plan
  * every round — unchecked that is 2^k by iteration k, and even bounded
  * fusion loses on a COLD JVM, where every over-sized fused stage compiles
  * fresh generated code. Loops therefore cut lineage every round by
  * default (identical per-round plan shapes → Catalyst + codegen caches
  * hit), with lazy/periodic/none variants selectable via GRAFT_CKPT_MODE
  * for warm-loop embedding (see [[Algorithms.chk]]).
  * At cluster scale each iteration is one shuffle on the node key.
  *
  * Reference counterparts: BFS `graph_engine/src/lib.rs:4674-4790`,
  * shortest path `:4794-4930`, weighted `:4933-5070`, connected components
  * `:6898-6941`, PageRank `:6943-7055`.
  */
object Algorithms {

  /** Per-round lineage cut. The DEFAULT is an eager cut every round —
    * measured this round (PERF.md §Round 3) as the best policy for a
    * cold JVM, which is what the bench and any one-shot query sees: every
    * iteration re-runs an identically-shaped small plan, so Catalyst
    * work and generated code are cached across rounds. Fused/periodic
    * variants win warm but lose 2–4× cold (unique oversized codegen per
    * stage); they stay available via GRAFT_CKPT_MODE ("lazy1" = lazy cut
    * every round, "periodic" = lazy cut every `every` rounds, "none") for
    * warm-loop embedding, where "periodic" is the right choice.
    */
  private val ckptMode = sys.env.getOrElse("GRAFT_CKPT_MODE", "eager")
  private def chk(df: DataFrame, i: Int, last: Int, every: Int = 4): DataFrame = ckptMode match {
    case "lazy1" => df.localCheckpoint(false)
    case "none" => df
    case "periodic" => if (i % every == 0 && i != last) df.localCheckpoint(false) else df
    case _ => df.localCheckpoint()
  }

  /** Loop-body lineage cut for call sites outside this object (same
    * policy switch as [[chk]], without round bookkeeping). */
  def cut(df: DataFrame): DataFrame = ckptMode match {
    case "lazy1" | "periodic" => df.localCheckpoint(false)
    case "none" => df
    case _ => df.localCheckpoint()
  }

  /** Materialization for SHARED artifacts — memoized frames consumed by
    * several queries (the g08/g28 co-occurrence aggregate, the d04/d10
    * shingle table, the d03/d07 pair set) or by several stages of one
    * query. Unlike [[cut]], whose job is severing ITERATIVE lineage and
    * which pays an RDD write + re-read of every row up front, a shared
    * artifact wants the columnar cache: compressed in-memory batches,
    * built on first use, spilled only under pressure, and a leaf
    * (InMemoryRelation) in every downstream plan, so lineage is equally
    * truncated. Measured at sf1.0 (PERF.md round 9): g08 paid 156 s
    * with an eager localCheckpoint of its 5e7-row pair aggregate vs
    * 34.6 s bare — the checkpoint write+re-read was 3.5× the query.
    * At cluster scale this is the difference between caching a hot
    * table and re-shipping it through the block manager row by row. */
  def memo(df: DataFrame): DataFrame = df.cache()

  /** Min-depth BFS from `source` to `maxDepth` over `edges` (directed as
    * given — pass the symmetric closure for undirected semantics).
    * Returns (key, depth).
    *
    * Traversal filters (reference `graph_engine/src/lib.rs:4674-4790`
    * takes a `TraversalFilter`, `lib.rs:482-654`, with node and edge
    * predicates): `edgePred` keeps only edges satisfying the predicate
    * (e.g. `col("etype") === "in_nation"`); `allowedNodes` restricts
    * which nodes the frontier may ENTER (a one-column `key` frame,
    * semi-joined against edge destinations). The source is always
    * included, matching the reference's start-node semantics. Both
    * filters are applied ONCE to the edge frame before the loop, so the
    * per-round plan shape is identical to the unfiltered BFS — at
    * cluster scale the filter rides the edge scan for free.
    */
  def bfs(edges: DataFrame, source: String, maxDepth: Int,
      edgePred: Option[Column] = None,
      allowedNodes: Option[DataFrame] = None): DataFrame = {
    val eFiltered = edgePred.map(edges.filter).getOrElse(edges)
    // The filtered edge frame is loop-invariant — materialize it once so
    // the per-level join reads stored rows instead of re-running the
    // filter/semi-join every level (guide §2.4; round 13).
    val e = cut(allowedNodes match {
      case Some(allowed) => eFiltered
        .join(allowed.select(col("key").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
      case None => eFiltered.select("src", "dst")
    })
    var reached = edges.sparkSession.range(1).select(lit(source).as("key"), lit(0).as("depth"))
    var frontier = reached
    for (i <- 1 to maxDepth) {
      val next = chk(frontier.join(e, col("key") === col("src"))
        .select(col("dst").as("key"), lit(i).as("depth"))
        .distinct()
        .join(reached.select(col("key").as("seen")), col("key") === col("seen"), "left_anti"),
        i, maxDepth)
      reached = reached.union(next)
      frontier = next
    }
    // min() guards duplicate keys if maxDepth revisits via shorter paths
    reached.groupBy("key").agg(min("depth").cast("int").as("depth"))
  }

  /** Multi-source BFS: like [[bfs]] but seeded from a whole frame of
    * start keys at depth 0 (one frontier⋈edges join per level, shared
    * across all sources — the standard way to compute distance-to-
    * nearest-landmark without |sources| separate traversals).
    */
  def bfsFrom(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = cut(edges.select("src", "dst")) // loop-invariant (see [[bfs]])
    var reached = seeds.select(col("key")).distinct().withColumn("depth", lit(0))
    var frontier = reached
    for (i <- 1 to maxDepth) {
      val next = chk(frontier.join(e, col("key") === col("src"))
        .select(col("dst").as("key"), lit(i).as("depth"))
        .distinct()
        .join(reached.select(col("key").as("seen")), col("key") === col("seen"), "left_anti"),
        i, maxDepth)
      reached = reached.union(next)
      frontier = next
    }
    reached.groupBy("key").agg(min("depth").cast("int").as("depth"))
  }

  /** [[bfsFrom]] run until the frontier exhausts — the statement-path
    * variant for user-shaped graphs where no depth bound is justifiable.
    * Level-synchronous with an anti-join against the reached set, so the
    * frontier strictly shrinks toward fixpoint; throws past `roundCap`
    * (safety, not semantics). Returns (key, depth) for every reachable
    * node at its true BFS distance. */
  def bfsFromFixpoint(edges: DataFrame, seeds: DataFrame, roundCap: Int = 256): DataFrame = {
    val e = cut(edges.select("src", "dst"))
    var reached = cut(seeds.select(col("key")).distinct().withColumn("depth", lit(0)))
    var frontier = reached
    var i = 0
    var alive = frontier.limit(1).count() > 0
    while (alive) {
      i += 1
      if (i > roundCap) throw new IllegalStateException(
        s"bfsFromFixpoint exceeded $roundCap levels — graph depth over the safety cap")
      val next = cut(frontier.join(e, col("key") === col("src"))
        .select(col("dst").as("key"), lit(i).as("depth"))
        .distinct()
        .join(reached.select(col("key").as("seen")), col("key") === col("seen"), "left_anti"))
      reached = reached.union(next)
      frontier = next
      alive = frontier.limit(1).count() > 0
    }
    reached.groupBy("key").agg(min("depth").cast("int").as("depth"))
  }

  /** Deterministic hash-greedy random walk: from each seed, `steps` hops;
    * at hop i the walker moves to the neighbor minimizing
    * md5("<i>|<cur>|<next>") — node2vec-style neighborhood sampling with
    * the RNG replaced by a content hash so any engine replays the exact
    * walk. One frontier⋈edges join per hop (keyed on the current node),
    * so the frontier stays ∝ the number of walks, never the graph size.
    * Returns (walk_id, cur, path); a walk whose node has no out-edge
    * simply ends (drops out of the frontier).
    */
  def hashGreedyWalk(und: DataFrame, seeds: DataFrame, steps: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val e = cut(und.select("src", "dst")) // loop-invariant (see [[bfs]])
    var f = seeds.select(col("key").as("walk_id"), col("key").as("cur"),
      col("key").as("path"))
    for (i <- 1 to steps) {
      f = f.join(e, col("cur") === col("src"))
        .withColumn("h",
          md5(concat_ws("|", lit(i.toString), col("cur"), col("dst")).cast("binary")))
        .withColumn("rn", row_number().over(
          w.partitionBy("walk_id").orderBy(col("h"), col("dst"))))
        .filter(col("rn") === 1)
        .select(col("walk_id"), col("dst").as("cur"),
          concat(col("path"), lit("->"), col("dst")).as("path"))
    }
    f
  }

  /** Bounded-hop single-source shortest paths over weighted edges
    * (src, dst, w) — Bellman-Ford style relaxation, `iters` rounds.
    * Returns (key, cost) for reached nodes.
    */
  def sssp(edges: DataFrame, source: String, iters: Int): DataFrame = {
    val e = cut(edges.select("src", "dst", "w")) // loop-invariant (see [[bfs]])
    var dist = edges.sparkSession.range(1).select(lit(source).as("key"), lit(0.0).as("cost"))
    for (i <- 1 to iters) {
      val relaxed = dist.join(e, col("key") === col("src"))
        .select(col("dst").as("key"), (col("cost") + col("w")).as("cost"))
      dist = chk(dist.union(relaxed).groupBy("key").agg(min("cost").as("cost")), i, iters)
    }
    dist
  }

  /** Connected components by min-key label propagation, `iters` rounds
    * (pick iters ≥ graph diameter). Returns (key, component).
    */
  def connectedComponents(undirectedEdges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    // the edge frame is loop-invariant — materialize once (see [[pageRank]])
    val e = cut(undirectedEdges.select("src", "dst"))
    var labels = nodes.select(col("key"), col("key").as("component"))
    for (i <- 1 to iters) {
      val viaNeighbor = labels.join(e, col("key") === col("src"))
        .select(col("dst").as("key"), col("component"))
      labels = chk(labels.union(viaNeighbor).groupBy("key").agg(min("component").as("component")),
        i, iters)
    }
    labels
  }

  /** [[connectedComponents]] plus a convergence probe: one extra
    * propagation round must leave every label unchanged, else `iters` was
    * below the graph's diameter and the labeling is silently split into
    * sub-components — an error class a fixed-round oracle CANNOT catch,
    * because both engines would be wrong identically. Fails loudly
    * instead. The probe is one extra join+agg over the final (already
    * materialized) labels; the returned frame is the plain iters-round
    * result, so oracle parity is unaffected.
    */
  /** Every triangle of the u<v-canonical simple edge frame `e0`, listed
    * EXACTLY once as a (a, b, c) corner triple (b < c in key order), via
    * the degree-ordered orientation (Schank & Wagner 2005, "Finding,
    * Counting and Listing All Triangles in Large Graphs" — the standard
    * node-iterator++ / forward algorithm): orient each edge toward its
    * (deg, key)-larger endpoint, build wedges only over each node's
    * OUT-adjacency, close against the canonical edge set. The wedge
    * shuffle is Σ_v d⁺(v)² ≤ O(|E|^{3/2}) because an out-degree counts
    * only HIGHER-degree neighbors — an SF-linear hub (a nation with all
    * its customers, a crawl host with all its pages) emits O(1) wedges
    * instead of O(deg²). The naive center-keyed wedge join this replaces
    * measured exponent 1.78 on 10× data (g38, PERF.md round 9); the
    * oriented plan is the 100 TB shape. Each triangle's minimal corner
    * in the (deg, key) total order has both out-edges, and no other
    * corner has both, so the listing is exact — per-node and per-edge
    * counts follow by scattering corners/sides.
    *
    * PRECONDITION: `e0` must be a DUPLICATE-FREE u<v-canonical frame
    * (`.distinct()` it if in doubt): a duplicated pair doubles both
    * endpoint degrees and lists each affected triangle repeatedly, and
    * the left_semi closure cannot absorb that. Every caller in this
    * repo canonicalizes with least/greatest + distinct.
    * Reference counterpart: graph_engine/src/lib.rs triangle counting
    * (per-node adjacency intersection). */
  def triangleTriples(e0: DataFrame): DataFrame = {
    val und = e0.select(col("u").as("x"), col("v").as("w"))
      .union(e0.select(col("v").as("x"), col("u").as("w")))
    val deg = und.groupBy("x").agg(count(lit(1)).as("dg"))
    val dir = e0
      .join(deg.select(col("x").as("u"), col("dg").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("dg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("b"))
    dir.select(col("a"), col("b").as("p"))
      .join(dir.select(col("a"), col("b").as("q")), Seq("a"))
      .filter(col("p") < col("q"))
      .join(e0, col("p") === col("u") && col("q") === col("v"), "left_semi")
      .select(col("a"), col("p").as("b"), col("q").as("c"))
  }

  /** Per-node triangle counts (key, tri) over the u<v-canonical simple
    * edge frame — each [[triangleTriples]] triple scattered to its three
    * corners. Nodes in no triangle are absent (callers coalesce). */
  def localTriangleCounts(e0: DataFrame): DataFrame =
    triangleTriples(e0)
      .select(explode(array(col("a"), col("b"), col("c"))).as("key"))
      .groupBy("key").agg(count(lit(1)).as("tri"))

  /** Per-edge triangle support (u, v, sup) over the u<v-canonical simple
    * edge frame — each triple scattered to its three canonical sides.
    * Zero-support edges are absent (k-truss peeling drops them anyway). */
  def edgeSupport(e0: DataFrame): DataFrame =
    triangleTriples(e0)
      .select(explode(array(
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
        struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v")),
        struct(col("b").as("u"), col("c").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("sup"))

  /** k-truss edge subgraph: iteratively delete every edge whose support
    * (number of triangles it closes) is < k−2, until fixpoint. `und` is
    * the u<v-normalized undirected edge list. This is the distributed
    * edge-peeling formulation (no per-node DFS state): each round
    * recomputes [[edgeSupport]] on the shrinking edge set — the
    * degree-ordered O(|E|^{3/2}) wedge bound, not the Σ deg² of a
    * center-keyed adjacency intersection — and the edge set only
    * shrinks. `rounds` must reach the peeling fixpoint; like
    * [[connectedComponentsChecked]], one extra recompute VERIFIES that
    * (silent non-convergence would match an identically-unrolled oracle
    * and pass the parity gate undetected).
    */
  def ktruss(und: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    def peel(e: DataFrame): DataFrame =
      e.join(edgeSupport(e).filter(col("sup") >= k - 2).select("u", "v"), Seq("u", "v"))
    var e = cut(und.select("u", "v"))
    for (i <- 1 to rounds) e = chk(peel(e), i, rounds)
    if (peel(e).count() != e.count()) throw new IllegalStateException(
      s"ktruss did not reach its fixpoint in $rounds rounds (a further peel still " +
        "removes edges) — raise the round count")
    e
  }

  def connectedComponentsChecked(undirectedEdges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val labels = connectedComponents(undirectedEdges, nodes, iters)
    val e = undirectedEdges.select("src", "dst")
    val next = labels.union(
        labels.join(e, col("key") === col("src")).select(col("dst").as("key"), col("component")))
      .groupBy("key").agg(min("component").as("c2"))
    val changed = labels.join(next, Seq("key"))
      .filter(col("component") =!= col("c2")).limit(1).count()
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $iters rounds (a further round still " +
        "changes labels) — raise the iteration count above the graph diameter")
    labels
  }

  /** Connected components run to FIXPOINT, for statement-path use where
    * the graph is user-shaped (overlay nodes/edges of arbitrary diameter)
    * and no round count can be justified up front. Each round is one
    * min-of-neighbors hop PLUS one pointer-jump (component ←
    * label(component)), so chains collapse in O(log diameter) rounds
    * rather than O(diameter); after every batch a convergence probe (one
    * extra hop compared against the current labels — the same check as
    * [[connectedComponentsChecked]]) decides whether to continue. Batches
    * grow geometrically so the total probe count is logarithmic in the
    * rounds actually needed. Throws if `roundCap` rounds don't converge
    * (a graph that deep is a misuse signal, not a silent-wrong-answer
    * license). Returns (key, component = min key in the component) —
    * identical labeling to [[connectedComponents]] at convergence.
    *
    * Reference runs CC on the live graph including created nodes
    * (`graph_engine/src/lib.rs:6898-6941`); this is the Spark analogue
    * with a convergence guarantee instead of Rust's in-memory BFS.
    */
  def connectedComponentsFixpoint(undirectedEdges: DataFrame, nodes: DataFrame,
      firstBatch: Int = 4, roundCap: Int = 256): DataFrame = {
    val e = cut(undirectedEdges.select("src", "dst"))
    var labels = cut(nodes.select(col("key"), col("key").as("component")))
    var total = 0
    var batch = firstBatch
    var converged = false
    while (!converged && total < roundCap) {
      val rounds = math.min(batch, roundCap - total)
      for (_ <- 1 to rounds) {
        val hop = labels.join(e, col("key") === col("src"))
          .select(col("dst").as("key"), col("component"))
        val merged = labels.union(hop).groupBy("key").agg(min("component").as("component"))
        // pointer-jump: every label value is itself a node key, so one
        // self-join rewrites component → label(component), halving chain
        // depth per round (the classic CC shortcut).
        labels = cut(merged.join(
            merged.select(col("key").as("component"), col("component").as("__jump")),
            Seq("component"), "left")
          .select(col("key"), coalesce(col("__jump"), col("component")).as("component")))
      }
      total += rounds
      batch *= 2
      val next = labels.union(
          labels.join(e, col("key") === col("src")).select(col("dst").as("key"), col("component")))
        .groupBy("key").agg(min("component").as("c2"))
      converged = labels.join(next, Seq("key"))
        .filter(col("component") =!= col("c2")).limit(1).count() == 0
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsFixpoint did not converge within $roundCap rounds — " +
        "graph diameter exceeds the safety cap")
    labels
  }

  /** Min label of any node reachable (in ≤ iters hops) along directed
    * edges — building block for SCC detection.
    */
  def minReachLabel(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val e = cut(edges.select("src", "dst")) // loop-invariant (see [[bfs]])
    var f = nodes.select(col("key"), col("key").as("lbl"))
    for (i <- 1 to iters) {
      val pulled = e.join(f.select(col("key").as("dst"), col("lbl")), Seq("dst"))
        .select(col("src").as("key"), col("lbl"))
      f = chk(f.union(pulled).groupBy("key").agg(min("lbl").as("lbl")), i, iters)
    }
    f
  }

  /** Directed reachability closure by squaring: after k rounds the frame
    * holds every (src, dst) with a path of length ≤ 2^k. log(diameter)
    * shuffle rounds instead of diameter rounds — the right trade when
    * per-round latency dominates (it does: each round is a full
    * shuffle+checkpoint barrier) AND the closure stays sparse. That holds
    * for asymmetric reachability like this DAG-plus-small-cycles graph
    * (leaves only reach their ancestor chain); do NOT use it for
    * undirected/symmetric closures, where the closure is quadratic in
    * component size.
    */
  def reachClosure(edges: DataFrame, rounds: Int): DataFrame = {
    var c = edges.select("src", "dst").distinct()
    for (i <- 1 to rounds) {
      val two = c.select(col("src"), col("dst").as("mid"))
        .join(c.select(col("src").as("mid"), col("dst")), Seq("mid"))
        .select("src", "dst")
      // 3 references per round → plan ×3^rounds unchecked; cut every 2.
      c = chk(c.union(two).distinct(), i, rounds, 2)
    }
    c
  }

  /** Strongly connected components via forward/backward min-label
    * reachability: nodes sharing the pair (min forward-reachable label,
    * min backward-reachable label) form one SCC. Exact when distinct SCCs
    * have distinct signatures (true for this graph's region cycles;
    * the general algorithm peels and repeats — reference Tarjan
    * `algorithms/scc.rs` is inherently sequential and doesn't map to a
    * cluster). Returns (key, scc) with scc = min key in the component.
    *
    * Both label directions derive from ONE squared reachability closure
    * (⌈log₂ iters⌉ rounds) instead of two iters-round propagations —
    * 14 sequential shuffle barriers became 3.
    */
  def stronglyConnectedComponents(edges: DataFrame, nodes: DataFrame, iters: Int,
      trimRounds: Int = 2): DataFrame = {
    // Trim prephase (the standard SCC reduction): a node with no
    // in-edges or no out-edges in the surviving subgraph lies on no
    // cycle, so it is a singleton SCC — peel those to (bounded)
    // fixpoint FIRST and run the expensive squared closure only over
    // the cyclic core. On this topology one round drops every
    // customer/supplier leaf and every region sink, shrinking the
    // closure's input from corpus-sized to the 25-nation cycle set;
    // partial trims are still exact (leftover acyclic nodes keep
    // distinct closure signatures), so trimRounds is a performance
    // knob, not a correctness one.
    // The edge frame is re-read 4× per trim round — materialize it once up
    // front, and once per round after the semi-joins (round 13, §2.4). The
    // has-out ∩ has-in core set is ONE endpoint aggregation instead of the
    // previous two distincts + join: same membership (max(o)=1 ⇔ the key
    // appears as some src, max(i)=1 ⇔ as some dst), one exchange.
    var e = Algorithms.cut(edges.select("src", "dst"))
    for (i <- 1 to trimRounds) {
      val core = Algorithms.cut(
        e.select(col("src").as("key"), lit(1).as("o"), lit(0).as("i"))
          .union(e.select(col("dst").as("key"), lit(0).as("o"), lit(1).as("i")))
          .groupBy("key").agg(max("o").as("o"), max("i").as("i"))
          .filter(col("o") === 1 && col("i") === 1)
          .select("key"))
      e = Algorithms.cut(
        e.join(core.select(col("key").as("src")), Seq("src"), "left_semi")
          .join(core.select(col("key").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst"))
    }
    val rounds = math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, iters - 1)))
    val cl = reachClosure(e, rounds).localCheckpoint(false)
    val coreNodes = e.select(col("src").as("key"))
      .union(e.select(col("dst").as("key"))).distinct()
    val fwd = coreNodes.select(col("key"), col("key").as("lbl"))
      .union(cl.select(col("src").as("key"), col("dst").as("lbl")))
      .groupBy("key").agg(min("lbl").as("flbl"))
    val bwd = coreNodes.select(col("key"), col("key").as("lbl"))
      .union(cl.select(col("dst").as("key"), col("src").as("lbl")))
      .groupBy("key").agg(min("lbl").as("blbl"))
    val sig = fwd.join(bwd, Seq("key"))
    val sccId = sig.groupBy("flbl", "blbl").agg(min("key").as("scc"))
    val coreScc = sig.join(sccId, Seq("flbl", "blbl")).select("key", "scc")
    // trimmed-away nodes are singleton SCCs by construction
    val singletons = nodes.select("key")
      .join(coreNodes, Seq("key"), "left_anti")
      .select(col("key"), col("key").as("scc"))
    coreScc.union(singletons)
  }

  /** Label propagation (the g15 engine, parameterized for the
    * `GRAPH LABELPROP` statement): `iters` rounds of majority-label
    * adoption with (count desc, label) tie-break — one neighbor-join +
    * windowed argmax per round, lineage-cut. Returns (key, lbl). */
  def labelPropagation(und: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    // edge frame is loop-invariant — materialize once (see [[pageRank]])
    val e = cut(und.select("src", "dst"))
    var labels = nodes.select(col("key"), col("key").as("lbl"))
    for (_ <- 1 to iters) {
      val counts = e
        .join(labels.select(col("key").as("dst"), col("lbl")), Seq("dst"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
      // argmax by (count desc, lbl asc) as ONE aggregation: min of the
      // struct (-c, lbl) — structs compare field-by-field, so smallest
      // -c = largest c, ties broken by smallest lbl: exactly the window's
      // (desc(c), lbl) row_number()=1 row, but with map-side partial
      // aggregation and no per-round sort (guide §2.3 "aggregate before
      // you shuffle"; round 13).
      labels = cut(counts
        .groupBy(col("src").as("key"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("lbl"))).as("s"))
        .select(col("key"), col("s.lbl").as("lbl")))
    }
    labels
  }

  /** Bounded-depth closeness centrality (the g18 engine, parameterized
    * for `GRAPH CLOSENESS`): multi-source BFS to `maxDepth`, then
    * (reached − 1) / Σdist per source. All sources sweep in ONE batched
    * frame (the g34/g42 multi-source pattern). Returns (key, closeness). */
  def closenessBounded(und: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    val e = cut(und.select("src", "dst")) // loop-invariant (see [[bfs]])
    var reach = sources.select(col("key").as("source"), col("key"), lit(0).as("dd"))
    var frontier = reach
    for (i <- 1 to maxDepth) {
      frontier = cut(frontier.join(e, col("key") === col("src"))
        .select(col("source"), col("dst").as("key"), lit(i).as("dd")))
      reach = reach.union(frontier)
    }
    reach.groupBy("source", "key").agg(min("dd").as("dd"))
      .groupBy("source").agg(count(lit(1)).as("cnt"), sum("dd").as("sd"))
      .select(col("source").as("key"),
        round((col("cnt") - 1) / col("sd"), 6).as("closeness"))
  }

  /** [[closenessBounded]] run to BFS fixpoint — the statement-path
    * variant. The bounded form's frontier deliberately skips the
    * reached-set anti-join (cheap when the horizon is 2, and min(dd)
    * dedupes after the fact), but that frontier never empties on a cyclic
    * graph, so the fixpoint form restores the anti-join: each round keeps
    * only first-visited (source, key) pairs, the frontier strictly
    * shrinks, and the loop ends when every source has exhausted its
    * component. Exact closeness on arbitrary topology; throws past
    * `roundCap`. */
  def closenessFixpoint(und: DataFrame, sources: DataFrame, roundCap: Int = 64): DataFrame = {
    val e = cut(und.select("src", "dst"))
    var reach = cut(sources.select(col("key").as("source"), col("key"), lit(0).as("dd")))
    var frontier = reach
    var i = 0
    var alive = frontier.limit(1).count() > 0
    while (alive) {
      i += 1
      if (i > roundCap) throw new IllegalStateException(
        s"closenessFixpoint exceeded $roundCap levels — graph depth over the safety cap")
      frontier = cut(frontier.join(e, col("key") === col("src"))
        .select(col("source"), col("dst").as("key"), lit(i).as("dd"))
        .distinct()
        .join(reach.select(col("source"), col("key")), Seq("source", "key"), "left_anti"))
      reach = reach.union(frontier)
      alive = frontier.limit(1).count() > 0
    }
    reach.groupBy("source", "key").agg(min("dd").as("dd"))
      .groupBy("source").agg(count(lit(1)).as("cnt"), sum("dd").as("sd"))
      .select(col("source").as("key"),
        round((col("cnt") - 1) / col("sd"), 6).as("closeness"))
  }

  /** One-level Louvain sweeps (the g21 engine, parameterized for
    * `GRAPH LOUVAIN`): each sweep moves every node to the
    * modularity-argmax neighboring community ((gain desc, comm)
    * tie-break). Returns (key, comm).
    *
    * `resolution` is the reference's CommunityConfig resolution γ
    * (`graph_engine/src/lib.rs:7442`): gain = evc − γ·deg·tot/2m, so
    * γ > 1 favors smaller communities, γ < 1 larger ones. */
  def louvainSweeps(und: DataFrame, nodes: DataFrame, sweeps: Int,
      resolution: Double = 1.0): DataFrame = {
    // edge + degree frames are loop-invariant — materialize once (§2.4)
    val e = cut(und.select("src", "dst"))
    val deg = cut(e.groupBy(col("src").as("key")).agg(count(lit(1)).as("deg")))
    val m2 = e.count().toDouble // = 2m (symmetric closure; e is materialized)
    var comm = nodes.select(col("key"), col("key").as("comm"))
    for (_ <- 1 to sweeps) {
      val tot = comm.join(deg, Seq("key")).groupBy("comm").agg(sum("deg").as("tot"))
      val evc = e
        .join(comm.select(col("key").as("dst"), col("comm")), Seq("dst"))
        .groupBy(col("src").as("key"), col("comm")).agg(count(lit(1)).as("evc"))
      val gains = evc.join(tot, Seq("comm")).join(deg, Seq("key"))
        .withColumn("gain",
          col("evc") - lit(resolution) * (col("deg").cast("double") * col("tot")) / lit(2.0 * (m2 / 2)))
      // argmax by (gain desc, comm asc) as ONE aggregation: min of the
      // struct (-gain, comm) — IEEE sign flip is exact, and Spark's double
      // ordering (java.lang.Double.compare) ranks -0.0 < 0.0 exactly as
      // the desc window did, so the winning (key, comm) rows are
      // identical to the row_number()=1 rows (see [[labelPropagation]]).
      comm = cut(gains
        .groupBy("key")
        .agg(min(struct((-col("gain")).as("ng"), col("comm").as("comm"))).as("s"))
        .select(col("key"), col("s.comm").as("comm")))
    }
    comm
  }

  /** Eigenvector centrality: power iteration x ← A·x / max(A·x) over the
    * undirected adjacency, `iters` fixed rounds from x₀ = 1. Max-
    * normalization keeps the scale exact (max is order-insensitive,
    * unlike a sum), so the oracle can unroll the same steps.
    *
    * `tolerance` > 0 adds the reference's convergence stop
    * (`parser.rs:2471-2510` EigenvectorCentrality{max_iterations,
    * tolerance}): end early once max|Δx| < tolerance. Gate queries keep
    * tolerance = 0 for the exact unrolled step count.
    */
  def eigenvector(undirectedEdges: DataFrame, nodes: DataFrame, iters: Int,
      tolerance: Double = 0.0): DataFrame = {
    // loop-invariant frames materialize once (see [[pageRank]])
    val e = cut(undirectedEdges.select("src", "dst"))
    val keys = cut(nodes.select(col("key")))
    var x = keys.select(col("key"), lit(1.0).as("x"))
    var i = 1
    var converged = false
    while (i <= iters && !converged) {
      val prev = x
      val ax = x.join(e, col("key") === col("src"))
        .groupBy(col("dst").as("key")).agg(sum("x").as("ax"))
      val mx = ax.agg(max("ax").as("mx"))
      // ax is referenced twice (values + max) → plan ×~2/round; cut every 3.
      x = chk(keys
        .join(ax, Seq("key"), "left")
        .crossJoin(mx)
        .select(col("key"), (coalesce(col("ax"), lit(0.0)) / col("mx")).as("x")),
        i, iters, 3)
      if (tolerance > 0) {
        val d = x.join(prev.select(col("key"), col("x").as("px")), Seq("key"))
          .agg(max(abs(col("x") - col("px"))).as("d")).collect()(0).getDouble(0)
        converged = d < tolerance
      }
      i += 1
    }
    x
  }

  /** HITS hubs & authorities (Kleinberg): `iters` rounds of
    * auth ← Aᵀ·hub, hub ← A·auth over the DIRECTED edge set, each
    * max-normalized (max is order-insensitive, so the oracle can unroll
    * the identical steps — same policy as [[eigenvector]]). Returns
    * (key, hub, auth). Each half-round is one shuffle keyed on the
    * receiving endpoint; at cluster scale the edge frame partitions once
    * and both joins reuse it.
    */
  def hits(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    // `a` below is assigned inside the loop; iters < 1 would leave it null
    // and NPE at the final join — fail loudly at the boundary instead.
    require(iters >= 1, s"HITS requires iters >= 1, got $iters")
    // both half-rounds re-read the edge frame — materialize once (§2.4)
    val e = cut(edges.select("src", "dst"))
    val keys = nodes.select(col("key"))
    // SPARSE score frames: a node with zero auth (no in-edges from
    // hub-carrying nodes) or zero hub contributes only +0.0 terms to the
    // next half-round's sums, and x + 0.0 == x for the nonnegative
    // scores here — so dropping zero rows from the LOOP is bit-identical
    // to the dense recurrence (max-normalization sees the same nonzero
    // population). The dense view is reconstructed ONCE at the end.
    var h = keys.select(col("key"), lit(1.0).as("hub"))
    var a: DataFrame = null
    for (i <- 1 to iters) {
      val a0 = h.join(e, col("key") === col("src"))
        .groupBy(col("dst").as("key")).agg(sum("hub").as("a0"))
      val am = a0.agg(max("a0").as("am"))
      a = chk(a0.crossJoin(am)
        .select(col("key"), (col("a0") / col("am")).as("auth")),
        i, iters, 3)
      val h0 = a.join(e, col("key") === col("dst"))
        .groupBy(col("src").as("key")).agg(sum("auth").as("h0"))
      val hm = h0.agg(max("h0").as("hm"))
      h = chk(h0.crossJoin(hm)
        .select(col("key"), (col("h0") / col("hm")).as("hub")),
        i, iters, 3)
    }
    keys.join(h, Seq("key"), "left").join(a, Seq("key"), "left")
      .select(col("key"), coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("auth"), lit(0.0)).as("auth"))
  }

  /** Sampled Brandes betweenness (reference Brandes `lib.rs:7058-7220`,
    * generalized beyond the diameter-2 midpoint form of g20): forward
    * level-synchronous multi-source BFS accumulates shortest-path counts
    * σ(s,v) (each level's σ is the sum over predecessors — exact because
    * the whole frontier is aggregated before expanding), then the backward
    * pass accumulates dependencies δ(v) = Σ_w (σ_v/σ_w)(1+δ_w) level by
    * level from the deepest ring inward. bc(v) = Σ_{s∈sources} δ_s(v).
    *
    * With all sources it is exact Brandes; with a deterministic sample it
    * is the standard pivot estimator — O(|sources|·E) instead of O(V·E),
    * which is the only form that survives 100 TB graphs. Every stage is a
    * shuffle on (source, key): at cluster scale the frontier frames
    * partition by source and stream.
    */
  def betweennessBrandes(und: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame =
    brandesImpl(und, sources, maxDepth, probe = false)

  /** [[betweennessBrandes]] with the forward BFS run until every source
    * exhausts its component — the statement-path variant for user-shaped
    * graphs, where a fixed horizon silently drops every shortest path
    * longer than it. The forward expansion already anti-joins the reached
    * set, so its frontier empties naturally at fixpoint; the backward
    * accumulation then walks the levels actually discovered. Exact
    * (sampled-pivot when `sources` is a sample) Brandes on arbitrary
    * topology; throws past `roundCap`. */
  def betweennessBrandesFixpoint(und: DataFrame, sources: DataFrame,
      roundCap: Int = 64): DataFrame =
    brandesImpl(und, sources, roundCap, probe = true)

  private def brandesImpl(und: DataFrame, sources: DataFrame, depthCap: Int,
      probe: Boolean): DataFrame = {
    val e = cut(und.select("src", "dst"))
    // forward: (source, key, dist, sigma)
    var reached = sources.select(col("key").as("source"), col("key"),
      lit(0).as("dist"), lit(1L).as("sigma"))
    var frontier = reached
    var maxDepth = depthCap
    var i = 0
    var expanding = true
    while (expanding) {
      i += 1
      if (i > depthCap) {
        if (probe) throw new IllegalStateException(
          s"betweenness forward BFS exceeded $depthCap levels — graph depth over the safety cap")
        expanding = false
      } else {
        // reached is re-read by both passes — cut lineage periodically but
        // let short traversals stay one fused plan.
        val expand = chk(frontier.join(e, col("key") === col("src"))
          .groupBy(col("source"), col("dst"))
          .agg(sum("sigma").as("sigma"))
          .join(reached.select(col("source"), col("key").as("dst")), Seq("source", "dst"), "left_anti")
          .select(col("source"), col("dst").as("key"), lit(i).as("dist"), col("sigma")),
          i, depthCap, 3)
        reached = reached.union(expand)
        frontier = expand
        if (probe && frontier.limit(1).count() == 0) {
          maxDepth = i - 1 // deepest level that actually holds nodes
          expanding = false
        }
      }
    }
    // backward: delta per (source, key), deepest level = 0.0, then each
    // level pulls (σ_v/σ_w)(1+δ_w) from its successors one ring out.
    // Level 0 is the sources themselves — δ_s(s) never counts, skip it.
    var delta = reached.filter(col("dist") === maxDepth).withColumn("delta", lit(0.0))
    for (lvl <- maxDepth - 1 to 1 by -1) {
      val upper = delta.filter(col("dist") === lvl + 1)
        .select(col("source"), col("key").as("dst"), col("sigma").as("sigw"), col("delta").as("dw"))
      val level = reached.filter(col("dist") === lvl)
      val contrib = level.join(e, col("key") === col("src"))
        .join(upper, Seq("source", "dst"))
        .groupBy("source", "key")
        .agg(sum((col("sigma").cast("double") / col("sigw")) * (lit(1.0) + col("dw"))).as("dsum"))
      val levelDelta = chk(level.join(contrib, Seq("source", "key"), "left")
        .select(col("source"), col("key"), col("dist"), col("sigma"),
          coalesce(col("dsum"), lit(0.0)).as("delta")),
        maxDepth - lvl, maxDepth - 1, 4)
      delta = delta.union(levelDelta)
    }
    delta.filter(col("key") =!= col("source"))
      .groupBy("key").agg(sum("delta").as("betweenness"))
  }

  /** A* shortest path: bounded Bellman-Ford relaxation with heuristic
    * pruning — after each round, any node whose f = cost + h exceeds the
    * best-known complete path to `target` is dropped from the frontier
    * (reference A* `algorithms/astar.rs` is a sequential priority queue;
    * the distributed analogue keeps the *pruning*, which is what makes A*
    * A*, and trades the strict expansion order for per-round parallelism).
    * With an admissible h (h(v) ≤ true remaining cost) the returned cost
    * equals Dijkstra's: nodes on an optimal path satisfy g*+h ≤ C* ≤ bound
    * once their label converges, so they always survive, and a prematurely
    * pruned node is re-relaxed from its surviving predecessor.
    *
    * `h`: (key, h) frame. Returns one row (from_key, to_key, cost).
    */
  def astar(edges: DataFrame, h: DataFrame, source: String, target: String, iters: Int): DataFrame = {
    astarLoop(edges, h, source, target, iters)
      .filter(col("key") === target)
      .select(lit(source).as("from_key"), col("key").as("to_key"), col("cost"))
  }

  /** Frontier size probe for [[astar]] pruning tests: same loop, returns
    * the surviving label count after `iters` rounds. */
  def astarSettledCount(edges: DataFrame, h: DataFrame, source: String, target: String, iters: Int): Long =
    astarLoop(edges, h, source, target, iters).count()

  /** Shared A* relaxation loop. The prune bound is read from the PREVIOUS
    * round's labels — it is still the cost of a known complete path (an
    * upper bound on C*, so nodes on an optimal path always survive: g*+h ≤
    * C* ≤ bound), just one round laggier than recomputing it mid-plan.
    * That halves the per-round plan: the merged frame is referenced once,
    * and the bound is a one-row aggregate over the materialized labels.
    */
  private def astarLoop(edges: DataFrame, h: DataFrame, source: String, target: String, iters: Int): DataFrame = {
    // loop-invariant frames materialize once (see [[bfs]])
    val e = cut(edges.select("src", "dst", "w"))
    val hp = cut(h.select("key", "h"))
    var dist = edges.sparkSession.range(1).select(lit(source).as("key"), lit(0.0).as("cost"))
    for (i <- 1 to iters) {
      val bound = dist.filter(col("key") === target).agg(min("cost").as("bound"))
      val relaxed = dist.join(e, col("key") === col("src"))
        .select(col("dst").as("key"), (col("cost") + col("w")).as("cost"))
      // dist is referenced 3× per round (bound, relax, union) → cut every 2.
      dist = chk(dist.union(relaxed).groupBy("key").agg(min("cost").as("cost"))
        .join(hp, Seq("key"), "left")
        .crossJoin(bound)
        .filter(col("bound").isNull ||
          (col("cost") + coalesce(col("h"), lit(0.0))) <= col("bound"))
        .select("key", "cost"),
        i, iters, 2)
    }
    dist
  }

  /** Biconnected components, Tarjan–Vishkin style (the sequential
    * reference uses a DFS low-link stack — `algorithms/biconnected.rs` —
    * which has no distributed analogue; the auxiliary-graph formulation
    * does): build a BFS spanning forest from `roots`, walk each non-tree
    * edge's fundamental cycle to its LCA (join-based climb, one round per
    * tree level), link the cycle's tree edges to the non-tree edge in an
    * edge-auxiliary graph, and run min-label connected components over it.
    * Fundamental cycles generate the cycle space, so the transitive
    * closure of "shares a fundamental cycle" is exactly the biconnected
    * relation. Edges in no cycle (bridges) stay singleton components.
    *
    * Every stage is a join/groupBy on node or edge keys — at cluster scale
    * it is O(depth + cycleLen + ccIters) shuffles, each partitioned by
    * key, with no driver-side state.
    *
    * Returns (src, dst, bicomp) for each undirected edge (src < dst),
    * bicomp = min edge id in its component.
    *
    * `maxDepth` bounds the BFS forest; `climbRounds` (default = maxDepth)
    * bounds the LCA climb separately — pass less when every cycle's
    * endpoints sit within a known depth of their LCA. A non-tree edge
    * with an endpoint outside the forest never joins the climb state and
    * stays a singleton component — correct exactly when no cycle crosses
    * the forest horizon, so maxDepth may also stop at the deepest cycle
    * level rather than the graph's full depth.
    */
  def biconnectedComponents(und: DataFrame, roots: DataFrame, maxDepth: Int, ccIters: Int,
      climbRounds: Int = -1): DataFrame = {
    val climb = if (climbRounds >= 0) climbRounds else maxDepth
    val e = cut(und.select("src", "dst")) // loop-invariant (see [[bfs]])
    // BFS forest: (key, parent, depth). Roots are their own parents.
    var tree = roots.select(col("key"), col("key").as("parent"), lit(0).as("depth"))
    var frontier = tree
    for (i <- 1 to maxDepth) {
      val next = frontier.join(e, col("key") === col("src"))
        .groupBy(col("dst")).agg(min(col("key")).as("parent")) // deterministic parent: min neighbor
        .join(tree.select(col("key").as("dst")), Seq("dst"), "left_anti")
        .select(col("dst").as("key"), col("parent"), lit(i).as("depth"))
        .transform(cut)
      tree = tree.union(next)
      frontier = next
    }
    biconnectedFromForest(e, tree, climb, probeClimb = false,
      (auxUnd, auxNodes) => connectedComponents(auxUnd, auxNodes, ccIters))
  }

  /** [[biconnectedComponents]] run to FIXPOINT on an arbitrary graph —
    * the statement-path variant, where the overlay may hold cycles at any
    * depth or whole components detached from the bundled topology, so no
    * fixed (depth, climb, cc) bound is justifiable. Self-roots: one
    * checked CC pass over the full graph yields per-component min-key
    * roots, so every component (region-attached or not) enters the BFS
    * forest; the forest grows frontier-driven until exhausted, the LCA
    * climb runs until every non-tree edge's endpoints meet, and the
    * auxiliary-graph CC is [[connectedComponentsFixpoint]]. Each loop
    * carries a `roundCap` safety throw — wrong-answer-silently is not an
    * exit path here, matching the reference's run-to-completion DFS
    * (`graph_engine/src/algorithms/biconnected.rs:112-280`).
    */
  def biconnectedComponentsFixpoint(und: DataFrame, roundCap: Int = 64): DataFrame = {
    val e = cut(und.select("src", "dst").distinct())
    val nodes = e.select(col("src").as("key")).distinct()
    val cc = connectedComponentsFixpoint(e, nodes)
    // component label IS the min node key — a valid, deterministic root
    val roots = cc.select(col("component").as("key")).distinct()
    var tree = roots.select(col("key"), col("key").as("parent"), lit(0).as("depth"))
      .transform(cut)
    var frontier = tree
    var depth = 0
    var alive = frontier.limit(1).count() > 0
    while (alive) {
      depth += 1
      if (depth > roundCap) throw new IllegalStateException(
        s"biconnected BFS forest exceeded $roundCap levels — graph depth over the safety cap")
      val next = frontier.join(e, col("key") === col("src"))
        .groupBy(col("dst")).agg(min(col("key")).as("parent"))
        .join(tree.select(col("key").as("dst")), Seq("dst"), "left_anti")
        .select(col("dst").as("key"), col("parent"), lit(depth).as("depth"))
        .transform(cut)
      tree = tree.union(next)
      frontier = next
      alive = frontier.limit(1).count() > 0
    }
    biconnectedFromForest(e, tree, roundCap, probeClimb = true,
      connectedComponentsFixpoint(_, _))
  }

  /** Shared tail of the biconnected labeling: non-tree edge extraction,
    * the LCA climb emitting (cycle id, tree-edge id) links, and CC over
    * the edge-auxiliary graph. `probeClimb` = false runs exactly
    * `climbCap` fixed rounds (gate path — deterministic, oracle-
    * unrollable); true runs until no live pair remains, throwing at
    * `climbCap` (statement path — arbitrary topology).
    */
  private def biconnectedFromForest(e: DataFrame, tree: DataFrame, climbCap: Int,
      probeClimb: Boolean, ccRun: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    // tree is read ~6 more times below (edge ids + two parent joins per
    // climb round) — one cut here pays for itself.
    val treeCut = tree.transform(cut)
    val eid = (a: Column, b: Column) => concat(least(a, b), lit("|"), greatest(a, b))
    val treeEdgeIds = treeCut.filter(col("depth") > 0).select(eid(col("key"), col("parent")).as("id"))
    // canonical undirected edges + their ids
    val edgesC = e.filter(col("src") < col("dst")).distinct()
      .select(col("src"), col("dst"), eid(col("src"), col("dst")).as("id"))
      .transform(cut)
    val nonTree = edgesC.join(treeEdgeIds, Seq("id"), "left_anti")
    // climb both endpoints of each non-tree edge to the LCA, emitting the
    // tree edges on the way: state (cid, a, da, b, db), the deeper side
    // steps to its parent each round (both step on a tie).
    val pa = treeCut.select(col("key"), col("parent"), col("depth"))
    var state = nonTree
      .join(pa.select(col("key").as("src"), col("depth").as("da")), Seq("src"))
      .join(pa.select(col("key").as("dst"), col("depth").as("db")), Seq("dst"))
      .select(col("id").as("cid"), col("src").as("a"), col("da"), col("dst").as("b"), col("db"))
      .transform(cut)
    var links = state.limit(0).select(col("cid"), col("cid").as("tid")) // (cycle id, tree-edge id)
    var round = 0
    var climbing = true
    while (climbing) {
      round += 1
      if (round > climbCap) {
        if (probeClimb) throw new IllegalStateException(
          s"biconnected LCA climb did not converge within $climbCap rounds — " +
            "cycle depth over the safety cap")
        climbing = false
      } else {
        val live = state.filter(col("a") =!= col("b"))
        val stepA = col("da") >= col("db") // deeper (or tied) a-side steps
        val stepB = col("db") >= col("da")
        val stepped = live
          .join(pa.select(col("key").as("a"), col("parent").as("pa2"), col("depth").as("da2")), Seq("a"))
          .join(pa.select(col("key").as("b"), col("parent").as("pb2"), col("depth").as("db2")), Seq("b"))
        links = links
          .union(stepped.filter(stepA).select(col("cid"), eid(col("a"), col("pa2")).as("tid")))
          .union(stepped.filter(stepB).select(col("cid"), eid(col("b"), col("pb2")).as("tid")))
        state = stepped.select(col("cid"),
            when(stepA, col("pa2")).otherwise(col("a")).as("a"),
            when(stepA, col("da2") - 1).otherwise(col("da")).as("da"),
            when(stepB, col("pb2")).otherwise(col("b")).as("b"),
            when(stepB, col("db2") - 1).otherwise(col("db")).as("db"))
          .transform(cut)
        // probe path exits as soon as every endpoint pair has met; the
        // fixed path runs its exact round budget (oracle-unrollable).
        if (probeClimb) climbing = state.filter(col("a") =!= col("b")).limit(1).count() > 0
      }
    }
    // edge-auxiliary graph: every edge id is a node; a cycle's non-tree id
    // links to each tree edge id on it. Min-label CC over it.
    val auxEdges = links.select(col("cid").as("src"), col("tid").as("dst"))
    val auxUnd = auxEdges.union(auxEdges.select(col("dst").as("src"), col("src").as("dst")))
    val auxNodes = edgesC.select(col("id").as("key"))
    val cc = ccRun(auxUnd, auxNodes)
    edgesC.join(cc, edgesC("id") === cc("key"))
      .select(col("src"), col("dst"), col("component").as("bicomp"))
  }

  /** PageRank, `iters` fixed iterations, damping 0.85, init 1.0, no
    * dangling-mass redistribution (sinks absorb; matches the unrolled
    * oracle). Returns (key, pr).
    *
    * `tolerance` > 0 adds the reference's convergence stop
    * (`ast.rs:1267-1279` PageRank{damping, tolerance, …}): the loop ends
    * early once max|Δpr| < tolerance. The check is one small agg over the
    * node-sized frame per round — statement-path convenience; the
    * oracle-gated queries keep tolerance = 0 so their unrolled step count
    * stays exact. */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int, damping: Double = 0.85,
      tolerance: Double = 0.0): DataFrame = {
    // Loop-invariant frames materialize ONCE (round 13; guide §2.4): the
    // un-cut contrib plan re-ran its degree aggregation + join inside
    // EVERY round's job (profiled at ~8 scheduler jobs per iteration,
    // task time trivial — the loop was paying per-round stages for
    // loop-invariant work). One cut each; every round then reads the
    // materialized rows. Same rows, same arithmetic, fewer stages.
    val outDeg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val contrib = cut(edges.join(outDeg, "src").select("src", "dst", "od"))
    val keys = cut(nodes.select(col("key")))
    var pr = keys.select(col("key"), lit(1.0).as("pr"))
    var i = 1
    var converged = false
    while (i <= iters && !converged) {
      val prev = pr
      val mass = pr.join(contrib, col("key") === col("src"))
        .select(col("dst"), (col("pr") / col("od")).as("m"))
        .groupBy("dst").agg(sum("m").as("mass"))
      pr = chk(keys
        .join(mass, col("key") === col("dst"), "left")
        .select(col("key"), (lit(1 - damping) + lit(damping) * coalesce(col("mass"), lit(0.0))).as("pr")),
        i, iters)
      if (tolerance > 0) {
        val d = pr.join(prev.select(col("key"), col("pr").as("prv")), Seq("key"))
          .agg(max(abs(col("pr") - col("prv"))).as("d")).collect()(0).getDouble(0)
        converged = d < tolerance
      }
      i += 1
    }
    pr
  }

  /** Personalized PageRank (random walk with restart; Jeh & Widom): the
    * teleport vector is uniform over `seeds("key")` instead of the whole
    * node set, so scores rank proximity TO THE SEEDS. Same lineage
    * policy as [[pageRank]], but the score frame is SPARSE: only nodes
    * the walk has touched carry rows (the rest are exactly 0, and both
    * consumers filter `pr > 0`) — so each round's join/agg is sized by
    * the seed component, not the whole graph, and the dense per-round
    * teleport join disappears. Bit-identical to the dense form: the
    * per-key update is the same two-term double sum (commutative), and
    * dropped rows only ever contributed +0.0 terms. `nodes` stays in
    * the signature for call-site symmetry with [[pageRank]]. No
    * dangling redistribution — callers pass an undirected (sink-free)
    * edge frame, mirroring the unrolled oracle.
    */
  def personalizedPageRank(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
      iters: Int, damping: Double = 0.85): DataFrame = {
    val ns = seeds.agg(count(lit(1)).as("ns"))
    val seedT = cut(seeds.select("key").crossJoin(broadcast(ns))
      .select(col("key"), (lit(1.0) / col("ns")).as("t")))
    // contrib is loop-invariant — materialize once (see [[pageRank]])
    val deg = edges.groupBy("src").agg(count(lit(1)).as("od"))
    val contrib = cut(edges.join(deg, "src").select("src", "dst", "od"))
    var pr = seedT.select(col("key"), col("t").as("pr"))
    for (i <- 1 to iters) {
      val mass = pr.join(contrib, col("key") === col("src"))
        .select(col("dst"), (col("pr") / col("od")).as("m"))
        .groupBy("dst").agg(sum("m").as("mass"))
      pr = chk(mass.select(col("dst").as("key"), (lit(damping) * col("mass")).as("pr"))
        .union(seedT.select(col("key"), (lit(1 - damping) * col("t")).as("pr")))
        .groupBy("key").agg(sum("pr").as("pr")),
        i, iters)
    }
    pr
  }
}
