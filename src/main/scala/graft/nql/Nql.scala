package graft.nql

/** AST for the NQL-specific statement surface (grammar shape follows the
  * reference parser `neumann_parser/src/ast.rs` §2.10-2.12 statements;
  * pure-SQL statements are not represented here — they pass through to
  * Catalyst's own parser, which supersedes the reference's SQL subset).
  */
trait Statement // extension point: CypherParser adds MatchStmt

/** Any statement Catalyst can parse natively (SELECT/WITH/SHOW/...). */
final case class SqlPassthrough(sql: String) extends Statement

/** `UPDATE <table> SET col = <expr>[, ...] [WHERE <pred>]` — executable
  * relational update (reference `relational_engine/src/lib.rs:3842`;
  * router `query_router/src/lib.rs:1974`). Catalyst cannot UPDATE a plain
  * parquet table, so this routes to [[graft.relational.TableDml]]'s
  * copy-on-write rewrite instead of SQL passthrough. SET values and the
  * predicate are full SQL expression strings. */
final case class SqlUpdate(table: String, sets: Seq[(String, String)],
    where: Option[String]) extends Statement

/** `DELETE FROM <table> [WHERE <pred>]` — executable relational delete
  * (reference `relational_engine/src/lib.rs:3954` delete_rows; router
  * `query_router/src/lib.rs:1975`), same copy-on-write path. */
final case class SqlDelete(table: String, where: Option[String]) extends Statement

sealed trait Metric
object Metric {
  case object Cosine extends Metric
  case object Euclidean extends Metric
  case object Dot extends Metric
}

/** Single condition `ident op literal`, chained with AND. Comparison
  * ops (= != < <= > >=) plus the reference's vector metadata-filter
  * forms (`vector_engine/src/lib.rs:297-324`): "in" (value =
  * Seq[Any]), "contains", "startswith", "exists" (value unused). */
final case class Cond(column: String, op: String, value: Any)

final case class Similar(
    key: String,
    metric: Metric = Metric.Cosine,
    limit: Int = 10,
    connectedTo: Option[String] = None,
    where: Seq[Cond] = Nil,
    usingIndex: Option[Int] = None, // Some(nprobe): route through the built IVF index
    collection: Option[String] = None) extends Statement

/** `SIMILAR RANGE '<key>' THRESHOLD <pct> [METRIC m]` — range search:
  * every vector whose (4-dp rounded) similarity clears pct/100, no k
  * cut. The result set is threshold-bounded, the top-k family's
  * complement (cosine/dot: score >= τ; euclidean: distance <= τ). */
final case class SimilarRange(key: String, thresholdPct: Int,
    metric: Metric = Metric.Cosine) extends Statement

/** SIMILAR by literal query vector (reference `ast.rs:713-747` allows a
  * key OR an inline vector). */
final case class SimilarVector(
    vec: Seq[Float],
    metric: Metric = Metric.Cosine,
    limit: Int = 10,
    where: Seq[Cond] = Nil,
    collection: Option[String] = None) extends Statement

/** `NEIGHBORS '<key>' [OUTGOING|INCOMING|BOTH] [TYPE 't'] [LIMIT n]` —
  * direction mirrors the reference NeighborsStmt
  * (`parser.rs:1702-1744`; its default is OUTGOING, ours stays BOTH —
  * the superset — for statement-compatibility with earlier rounds). */
final case class Neighbors(
    key: String,
    bySimilarityTo: Option[String] = None,
    etype: Option[String] = None,
    limit: Option[Int] = None,
    direction: String = "both") extends Statement

final case class PathShortest(from: String, to: String, maxDepth: Int = 6) extends Statement
final case class PathWeighted(from: String, to: String, maxHops: Int = 6) extends Statement

final case class NodeGet(key: String) extends Statement
final case class NodeList(label: Option[String], limit: Option[Int],
    offset: Option[Int] = None) extends Statement
final case class EdgeList(etype: Option[String], limit: Option[Int],
    offset: Option[Int] = None) extends Statement
final case class Degree(key: String) extends Statement

sealed trait GraphAlgo extends Statement
/** `GRAPH PAGERANK [ITERATIONS n] [DAMPING d] [TOLERANCE t]
  * [OUTGOING|INCOMING|BOTH] [EDGE TYPE 't'] [ENGINE e]` — the full
  * reference PageRank parameter surface (`ast.rs:1267-1279`, grammar
  * `parser.rs:2361-2405`); tolerance > 0 enables early convergence
  * stop; direction/edge-type switch the walked edge set (None/None =
  * the round-1 tree-edge default, unchanged). */
final case class GraphPageRank(iterations: Int = 10, engine: String = "dataframe",
    damping: Double = 0.85, tolerance: Double = 0.0,
    etype: Option[String] = None, direction: Option[String] = None) extends GraphAlgo
final case class GraphComponents(engine: String = "dataframe") extends GraphAlgo
/** `GRAPH TRIANGLES [EDGE TYPE 't'] [ENGINE 'e']` — per-node triangle
  * counts over the WHOLE overlay graph by default, optionally restricted
  * to one edge type (the reference's `TriangleConfig.edge_type`,
  * `graph_engine/src/algorithms/triangles.rs:18,30`; `count_triangles`
  * builds adjacency from all neighbors, `triangles.rs:99-130`). */
final case class GraphTriangles(engine: String = "dataframe",
    etype: Option[String] = None) extends GraphAlgo
final case class GraphBiconnected() extends GraphAlgo
final case class GraphArticulation() extends GraphAlgo
final case class GraphHits(iterations: Int = 4) extends GraphAlgo
final case class GraphClustering() extends GraphAlgo
final case class GraphAssortativity() extends GraphAlgo
/** `GRAPH PPR FROM '<key>' [ITERATIONS n]` — personalized PageRank with
  * the teleport vector concentrated on one node (g41's engine,
  * [[graft.graph.Algorithms.personalizedPageRank]]). */
final case class GraphPpr(from: String, iterations: Int = 8) extends GraphAlgo
/** `GRAPH DIAMETER` — double-sweep pseudo-diameter (BFS from the min
  * key, then BFS from the farthest node found; the standard heuristic
  * that replaces an all-sources eccentricity sweep at scale). Reports
  * the second sweep's peripheral node and its distance, within the
  * start node's component. */
final case class GraphDiameter() extends GraphAlgo
/** `GRAPH CORES [MAX k]` — full k-core decomposition histogram (max row
  * = degeneracy; reference kcore.rs `kcore_decomposition`). */
final case class GraphCores(maxK: Int = 6) extends GraphAlgo
// Statement forms for the remaining reference GraphAlgorithm variants
// (`ast.rs` BetweennessCentrality / ClosenessCentrality /
// EigenvectorCentrality / LabelPropagation / LouvainCommunities) — each
// compiles to the corresponding parameterized engine in Algorithms.
/** `GRAPH EIGENVECTOR [CENTRALITY] [ITERATIONS n] [TOLERANCE t]
  * [OUTGOING|INCOMING|BOTH] [EDGE TYPE 't']` — full reference surface
  * (`parser.rs:2471-2510`); tolerance > 0 = early convergence stop. */
final case class GraphEigenvector(iterations: Int = 4, tolerance: Double = 0.0,
    etype: Option[String] = None, direction: Option[String] = None) extends GraphAlgo
/** `GRAPH BETWEENNESS [SAMPLE|SAMPLING pct] [OUTGOING|INCOMING|BOTH]
  * [EDGE TYPE 't']` — pct mirrors the reference's sampling_ratio
  * (`graph_engine/src/lib.rs:7058-7130`): sources are a deterministic
  * hash-sample of ⌈n·pct/100⌉ nodes and scores scale by n/|sample| (the
  * standard pivot estimator). Without SAMPLE, the statement keeps its
  * exact nation/region-source form; direction/edge-type switch the
  * traversed edge set (grammar `parser.rs:2407-2440`). */
final case class GraphBetweenness(samplePct: Option[Int] = None,
    etype: Option[String] = None, direction: Option[String] = None) extends GraphAlgo
/** `GRAPH CLOSENESS [OUTGOING|INCOMING|BOTH] [EDGE TYPE 't']` —
  * direction/edge-type per the reference grammar (`parser.rs:2442+`);
  * defaults keep the g18 nation/region-tree form. */
final case class GraphCloseness(etype: Option[String] = None,
    direction: Option[String] = None) extends GraphAlgo
/** `GRAPH LABELPROP|LABEL PROPAGATION [ITERATIONS n] [dir] [EDGE TYPE]`
  * (reference spelling `parser.rs:2553-2588`). */
final case class GraphLabelProp(iterations: Int = 3,
    etype: Option[String] = None, direction: Option[String] = None) extends GraphAlgo
/** `GRAPH LOUVAIN [COMMUNITIES] [SWEEPS|PASSES n] [RESOLUTION r] [dir]
  * [EDGE TYPE 't']` — r is the reference CommunityConfig resolution γ
  * (`graph_engine/src/lib.rs:7442`); PASSES is the reference's sweep
  * count spelling (`parser.rs:2512-2551`). */
final case class GraphLouvain(sweeps: Int = 2, resolution: Double = 1.0,
    etype: Option[String] = None, direction: Option[String] = None) extends GraphAlgo
/** `GRAPH TRANSITIVITY` — global transitivity + average local clustering
  * (reference `global_clustering_coefficient`/`average_clustering`). */
final case class GraphTransitivity() extends GraphAlgo

final case class EmbedGet(key: String) extends Statement
/** `EMBED DELETE '<key>'` — remove the stored vector (reference
  * EmbedOp::Delete, `parser.rs:1792-1794`). Props-preserving: the
  * reference's vector and graph engines are orthogonal, so deleting an
  * embedding must not delete the node/entity living under the same key —
  * the entity row survives with `embedding = NULL`; a props-less row
  * tombstones entirely. Bundled `vec:*` driver data is read-only and
  * rejected loudly. */
final case class EmbedDelete(key: String) extends Statement
/** `COUNT EMBEDDINGS` (reference `parser.rs:1550-1562`): bundled +
  * store vectors, one count row. */
final case class CountEmbeddings() extends Statement
/** `SHOW VECTOR INDEX` (reference ShowVectorIndex, `parser.rs:1497`):
  * the session ANN index's cell census, or a no-index status row. */
final case class ShowVectorIndex() extends Statement
/** `DESCRIBE NODE <label>` / `DESCRIBE EDGE <type>` (reference
  * DescribeTarget::Node/Edge, `parser.rs:1527-1548`): property census —
  * (property, n_present) over the overlay-aware frame. */
final case class DescribeNode(label: String) extends Statement
final case class DescribeEdge(etype: String) extends Statement

/** `CONSTRAINT CREATE <name> ON NODE [label]|EDGE [type] PROPERTY <p>
  * UNIQUE|EXISTS|TYPE <t>` + DROP/LIST/GET/CHECK (reference
  * GraphConstraintStmt, `parser.rs:2701-2800`;
  * `graph_engine/src/lib.rs:7613-7700` enforces on write). Here
  * constraints REGISTER declaratively and `CONSTRAINT CHECK <name>`
  * runs the validate-on-scan job from [[graft.unified.Constraints]],
  * returning the violating rows (empty = holds) — the lakehouse audit
  * form of the same contract (SURVEY §2.1 decision). */
final case class ConstraintCreate(name: String, onEdges: Boolean,
    filter: Option[String], property: String, ctype: String,
    typeName: Option[String]) extends Statement
final case class ConstraintDrop(name: String) extends Statement
final case class ConstraintList() extends Statement
final case class ConstraintGet(name: String) extends Statement
final case class ConstraintCheck(name: String) extends Statement
/** `EMBED LIST [IN '<collection>'] [LIMIT n]` — the reference's
  * ShowEmbeddings surface (`ast.rs` ShowEmbeddings): keys + dimension +
  * label/collection, deterministic key order. */
final case class EmbedList(collection: Option[String], limit: Option[Int]) extends Statement
final case class EntityGet(key: String) extends Statement

// write-path statements (execute against the session's EntityStore)
final case class NodeCreate(key: String, label: String, name: Option[String],
    props: Map[String, String] = Map.empty) extends Statement
/** One node of a batch create: key, label, optional display name, and any
  * further properties. Built by both the `NODE BATCH CREATE 'k' LABEL 'l'
  * [NAME 'n'] AND ...` spelling (no extra props there) and the reference's
  * literal `BATCH CREATE NODES [{labels: [...], ...}]` form
  * (`neumann_parser/src/parser.rs:2880-2933`). */
final case class BatchNode(key: String, label: String, name: Option[String],
    props: Map[String, String] = Map.empty)
/** Batch node create (reference CreateNodes, `graph_engine/src/lib.rs:
  * 8027-8380`): one log append. */
final case class NodeBatchCreate(items: Seq[BatchNode]) extends Statement
/** `EDGE BATCH CREATE 'a' TO 'b' TYPE 't' AND 'c' TO 'd' ...` — batch
  * edge create (reference CreateEdges): one log append. */
final case class EdgeBatchCreate(items: Seq[(String, String, String)]) extends Statement
/** `BATCH DELETE NODES [k1, k2, ...]` (reference GraphBatchOp::DeleteNodes,
  * `neumann_parser/src/parser.rs:2836-2860`): one tombstone append for the
  * whole key list. Numeric reference node ids arrive as their string form —
  * this engine's node identity is the key. */
final case class NodeBatchDelete(keys: Seq[String]) extends Statement
/** `BATCH UPDATE NODES [{id: k, prop: v, ...}, ...]` (reference
  * GraphBatchOp::UpdateNodes, `parser.rs:2862-2878,3029-3061`): merge-props
  * per node, EntityUpdate semantics batched — one read of the current rows
  * (bounded by the statement's literal batch size) and one log append. */
final case class NodeBatchUpdate(items: Seq[(String, Map[String, String])]) extends Statement
final case class NodeDelete(key: String) extends Statement
final case class EdgeCreate(src: String, dst: String, etype: String) extends Statement
final case class EdgeDelete(src: String, dst: String, etype: String) extends Statement
final case class EntityCreate(key: String, props: Map[String, String], embedding: Option[Array[Float]]) extends Statement
final case class EntityDelete(key: String) extends Statement
/** `ENTITY UPDATE '<key>' SET k = 'v', ...` — merge-props update of an
  * existing store entity (reference ENTITY UPDATE, `ast.rs:797-858`,
  * `tensor_unified/src/lib.rs:475-880`): unnamed props and the embedding
  * are preserved, named props overwrite. Fails loudly on a missing key
  * (an update is not an upsert). */
final case class EntityUpdate(key: String, props: Map[String, String],
    embedding: Option[Array[Float]] = None) extends Statement
final case class EntityConnect(src: String, dst: String, etype: String) extends Statement
/** `EMBED BATCH 'k1' (v, ...), 'k2' (v, ...) [IN '<collection>']` —
  * batch vector store (reference `EMBED BATCH [...]`, `ast.rs:704-708`):
  * ONE versioned log append for the whole batch. */
final case class EmbedBatch(items: Seq[(String, Array[Float])],
    collection: Option[String]) extends Statement
/** `ENTITY BATCH CREATE 'k1' [SET k = 'v', ...] AND 'k2' ...` — batch
  * entity create (reference `ENTITY BATCH CREATE [...]`,
  * `ast.rs:842-856`): one log append for the whole batch. */
final case class EntityBatchCreate(items: Seq[(String, Map[String, String])]) extends Statement
final case class EmbedStore(key: String, vector: Array[Float],
    collection: Option[String] = None) extends Statement

/** `EMBED BUILD INDEX IVF [CLUSTERS k]` — build + register the session's
  * ANN index over the bundled embeddings (reference `EMBED BUILD INDEX`
  * statement `neumann_parser/src/ast.rs:703`; index-vs-brute routing
  * `query_router/src/lib.rs:5414-5447`). Without CLUSTERS the cells are
  * the deterministic per-label cells (the v08 oracle-checkable form);
  * with CLUSTERS k they are KMeans-learned (fixed seed, API-level only).
  */
final case class EmbedBuildIndex(clusters: Option[Int]) extends Statement

/** `EMBED DROP INDEX` — deregister the session ANN index; subsequent
  * SIMILAR ... USING INDEX fails loudly until rebuilt. */
final case class EmbedDropIndex() extends Statement

/** `EMBED COLLECTION CREATE '<name>' DIMENSION n [METRIC m]` — register
  * per-collection vector config, validated on EMBED STORE ... IN and
  * SIMILAR ... IN (reference named collections with per-collection
  * dimension/metric, `vector_engine/src/lib.rs:1369-1585`). */
final case class EmbedCollectionCreate(name: String, dimension: Int, metric: Metric) extends Statement

/** `GRAPH MATCH COUNT <pattern> [WHERE ...]` / `GRAPH MATCH EXISTS ...` —
  * pattern-match count/exists statement forms over the Cypher motif
  * machinery (reference `graph_engine/src/lib.rs:5945-6090`). */
final case class GraphMatchCount(pattern: CypherParser.MatchStmt) extends Statement
final case class GraphMatchExists(pattern: CypherParser.MatchStmt) extends Statement

/** `GRAPH COUNT NODES [LABEL 'x']` / `GRAPH COUNT EDGES [TYPE 'x']` —
  * the reference's CountNodes/CountEdges statement forms (`ast.rs:
  * 1430-1487`; executor `graph_engine/src/lib.rs:5705-5829`), overlay-
  * aware (store-created nodes/edges count, tombstoned ones don't). */
final case class GraphCountNodes(label: Option[String]) extends Statement
final case class GraphCountEdges(etype: Option[String]) extends Statement

/** `GRAPH AGGREGATE SUM|AVG|MIN|MAX|COUNT '<prop>' NODES [LABEL 'x']
  * [WHERE ...]` (or `EDGES [TYPE 'x']`) — property aggregation over the
  * graph (reference AggregateNodeProperty/AggregateEdgeProperty,
  * `ast.rs:1430-1487`, `graph_engine/src/lib.rs:5705-5829`). Node
  * properties surface the numeric columns the TPC-H model carries
  * (`acctbal` on customer/supplier); the edge property `weight` is the
  * g10 per-etype weighting. */
final case class GraphAggregate(func: String, prop: String,
    overEdges: Boolean, filter: Option[String], where: Seq[Cond]) extends Statement
/** `FIND ROWS [FROM] <table> [WHERE …] [RETURN cols] [LIMIT n]` —
  * relational arm of the unified FIND statement (reference
  * `ast.rs:768-793` FindPattern::Rows; router `lib.rs:5453-5509`). */
final case class Find(target: String, where: Seq[Cond], limit: Option[Int],
    ret: Seq[String] = Nil) extends Statement

/** `FIND NODES ['<label>'|label] [WHERE …] [RETURN cols] [LIMIT n]` —
  * graph-node arm (reference FindPattern::Nodes, `ast.rs:769-773`;
  * NODE/NODES/VERTEX all accepted, like the reference token aliases).
  * Overlay-aware: store-created nodes appear, tombstoned ones don't. */
final case class FindNodes(label: Option[String], where: Seq[Cond],
    ret: Seq[String], limit: Option[Int]) extends Statement

/** `FIND EDGES ['<type>'|type] [WHERE …] [RETURN cols] [LIMIT n]` —
  * edge arm (reference FindPattern::Edges, `ast.rs:774-778`). */
final case class FindEdges(etype: Option[String], where: Seq[Cond],
    ret: Seq[String], limit: Option[Int]) extends Statement

/** `FIND PATH [FROM '<key>'] [VIA '<etype>'] [TO '<key>'] [LIMIT n]` —
  * path arm (reference FindPattern::Path {from, edge, to},
  * `ast.rs:784-792`; executor `tensor_unified/src/lib.rs:1154-1240`):
  * FROM+TO = BFS shortest path hop list; FROM only = outgoing
  * connections (VIA-filtered); TO only = incoming. FROM or TO required,
  * like the reference's "Path query requires 'from' or 'to'". */
final case class FindPath(from: Option[String], via: Option[String],
    to: Option[String], limit: Option[Int]) extends Statement

/** `BLOBS SIMILAR TO '<key>' [LIMIT k]` — embedding search over binary
  * artifacts (reference BLOB store `ast.rs:1127-1167`, parser
  * `neumann_parser/src/parser.rs:3377`). SURVEY §2.15 scopes every other
  * admin op out but keeps this one: it is SIMILAR over the blob table —
  * searchable set = blobs that carry an embedding. */
final case class BlobsSimilar(key: String, limit: Int = 10) extends Statement

// Statement fronts for the beyond-reference batch operators (ASOF /
// SAMPLE / DEDUP), so the unified language covers the training-pipeline
// surface too (COVERAGE.md "north-star additions").
/** `ASOF '<leftType>' TO '<rightType>' ON <key> AT <ts>`: each left event
  * paired with the latest right event at-or-before it, per key. */
final case class AsofJoin(leftType: String, rightType: String, key: String, tsCol: String) extends Statement
/** `SAMPLE <table> RATE <pct> KEY <col>`: deterministic md5-hash sample. */
final case class Sample(table: String, ratePct: Int, keyCol: String) extends Statement
/** `DEDUP <table> BY <col> KEY <col>`: exact dedup, keep min-key row. */
final case class Dedup(table: String, byCol: String, keyCol: String) extends Statement
/** `DEDUP AGAINST '<source>'`: incremental near-dedup of every other
  * source against that corpus's MinHash band signatures (d13 engine). */
final case class DedupAgainst(corpusSource: String) extends Statement
/** `REBALANCE <table> BY <col> BUDGET <pct> KEY <col>`: equal-share
  * budget mix — the d08 mechanism as a statement (each group is
  * downsampled to its share of a pct-of-total budget; groups below
  * their share keep everything). */
final case class Rebalance(table: String, byCol: String, budgetPct: Int, keyCol: String) extends Statement
/** `SEMDEDUP <table> BY <cluster-col> THRESHOLD <pct> KEY <id-col> VECTOR <vec-col>`:
  * SemDeDup-style semantic dedup census — pairwise cosine ONLY within
  * each cluster (pct/100 threshold), keep-lowest-key exemplar; the d11
  * mechanism as a statement. */
final case class SemDedup(table: String, byCol: String, thresholdPct: Int,
    keyCol: String, vecCol: String) extends Statement

/** `TRAVERSE FROM '<key>' DEPTH n [TYPE '<etype>'] [LABEL '<label>']` —
  * filtered BFS statement form (reference TRAVERSE with a
  * `TraversalFilter`, `ast.rs:611-667`,
  * `graph_engine/src/lib.rs:4674-4790,482-654`): TYPE keeps only edges
  * of that type; LABEL restricts which nodes the frontier may enter
  * (the source is always included). */
final case class Traverse(from: String, depth: Int,
    etype: Option[String] = None, label: Option[String] = None) extends Statement

/** WALK FROM '<key>' STEPS n — deterministic hash-greedy random walk
  * (the g35 engine, [[graft.graph.Algorithms.hashGreedyWalk]], as a
  * statement; a sampling extension over the reference's traversal
  * surface). */
final case class Walk(from: String, steps: Int) extends Statement

/** HYBRID '<term>' VECTOR <id> [LIMIT k] — keyword + vector retrieval
  * fused with reciprocal ranks (the u05 engine as a statement). */
final case class Hybrid(term: String, vecId: Long, limit: Int = 10) extends Statement

/** `BPE TRAIN ROUNDS n` — distributed BPE merge discovery over the
  * documents table (the t18 engine as a statement; one row per merge
  * round). */
final case class BpeTrain(rounds: Int) extends Statement

/** `HEAVY HITTERS TOP k` — count-min-sketch heavy hitters over the
  * documents token stream (the t19 engine as a statement). */
final case class HeavyHitters(top: Int = 20) extends Statement

/** `CHUNK WINDOW w STRIDE s` — fixed-window token chunk census over the
  * documents table (the t21 engine, parameterized). */
final case class ChunkCensus(window: Int, stride: Int) extends Statement
/** `MMR <id> [POOL p] [LIMIT k]` — maximal-marginal-relevance
  * diversified re-ranking of vector search results (the v18 engine as a
  * statement: top-p relevance pool for query vector id, k greedy picks
  * maximizing 0.7·rel − 0.3·max-sim-to-selected). */
final case class MmrRerank(vecId: Long, pool: Int = 20, limit: Int = 5) extends Statement

final case class NqlParseException(msg: String) extends RuntimeException(msg)

/** Runtime failure of a well-formed statement (missing entity, dimension
  * clash discovered against live data, …) — distinct from
  * [[NqlParseException]] so callers can tell "fix the statement text"
  * apart from "fix the data / retry". */
final case class NqlExecException(msg: String) extends RuntimeException(msg)
