package graft.unified

import graft.{QDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Unified cross-engine operators (SURVEY.md §2.12) — the reference's
  * flagship: one entity key resolves to relational fields, graph edges and
  * an embedding simultaneously. Entities here are `vec:{id}` over the
  * embeddings table; the graph relation is the same-label clique
  * (neighbors(e) = other members of e's label).
  *
  * `SIMILAR k CONNECTED TO e` reproduces the reference semantics exactly
  * (`tensor_unified/src/lib.rs:884-938`): take top-2k by similarity
  * (2× oversample), intersect with neighbors(e), keep top-k by score.
  */
object UnifiedQueries {
  private def emb(s: SparkSession, d: String): DataFrame = Tables(s, d, "embeddings")

  private def qv(s: SparkSession, d: String, id: Long): DataFrame =
    emb(s, d).filter(col("vec_id") === id).select(col("embedding").as("qv"))

  /** Hybrid keyword+vector retrieval via reciprocal-rank fusion (see the
    * u05 entry for the plan-shape discussion). `term` must be a plain
    * word (validated by the NQL parser before it reaches the lambda).
    */
  def hybridRrf(s: SparkSession, d: String, term: String, vecId: Long,
                limit: Int): DataFrame = {
    val tf = Tables(s, d, "documents").select(col("doc_id"),
      expr(s"size(filter(split(text, '\\\\s+'), w -> w = '$term'))").as("tf"))
    // row_number over the already-limited 20-row frame (not the corpus)
    val tr = tf.orderBy(desc("tf"), col("doc_id")).limit(20)
      .withColumn("rt", row_number().over(Window.orderBy(desc("tf"), col("doc_id"))))
    val vs = emb(s, d).crossJoin(broadcast(qv(s, d, vecId)))
      .select(col("vec_id"),
        round(cosine_similarity(col("embedding"), col("qv")), 4).as("score"))
    val vr = vs.orderBy(desc("score"), col("vec_id")).limit(20)
      .withColumn("rv", row_number().over(Window.orderBy(desc("score"), col("vec_id"))))
    tr.join(vr, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("id"),
        (coalesce(expr("CAST(round(1e6 / (60 + rt), 0) AS BIGINT)"), lit(0L)) +
          coalesce(expr("CAST(round(1e6 / (60 + rv), 0) AS BIGINT)"), lit(0L))).as("rrf_ppm"))
      .orderBy(desc("rrf_ppm"), col("id")).limit(limit)
  }

  /** neighbors(e) = same-label entities, excluding e itself. */
  private def neighbors(s: SparkSession, d: String, id: Long): DataFrame = {
    val lab = emb(s, d).filter(col("vec_id") === id).select(col("label").as("elabel"))
    emb(s, d).crossJoin(broadcast(lab))
      .filter(col("label") === col("elabel") && col("vec_id") =!= id)
      .select(col("vec_id"))
  }

  val defs: Seq[(String, QDef)] = Seq(

    // FIND ... WHERE over the entity table (uniform relational-style scan).
    "u01_entity_find" -> QDef(
      (s, d) => emb(s, d)
        .filter(col("label").isin(2, 4) && col("vec_id") < 100)
        .select(concat(lit("vec:"), col("vec_id").cast("string")).as("key"), col("label"))
        .orderBy("key"),
      """SELECT 'vec:' || CAST(vec_id AS VARCHAR) AS key, label
        |FROM embeddings WHERE label IN (2, 4) AND vec_id < 100
        |ORDER BY key""".stripMargin),

    // SIMILAR 'vec:0' CONNECTED TO 'vec:1' LIMIT 10 — top-2k similar ∩
    // neighbors(e), then top-k by score desc (2× oversample semantics).
    "u02_similar_connected_to" -> QDef(
      (s, d) => {
        val top2k = emb(s, d).filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv(s, d, 0)))
          .select(col("vec_id"),
            round(cosine_similarity(col("embedding"), col("qv")), 4).as("score"))
          .orderBy(desc("score"), col("vec_id")).limit(20)
        top2k.join(neighbors(s, d, 1), Seq("vec_id"))
          .orderBy(desc("score"), col("vec_id")).limit(10)
          .select("vec_id", "score")
      },
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |el AS (SELECT label AS elabel FROM embeddings WHERE vec_id = 1),
        |top2k AS (
        |  SELECT e.vec_id,
        |    round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),4) AS score
        |  FROM embeddings e, q WHERE e.vec_id <> 0
        |  ORDER BY score DESC, e.vec_id LIMIT 20),
        |nb AS (SELECT vec_id FROM embeddings, el WHERE label = elabel AND vec_id <> 1)
        |SELECT t.vec_id, t.score FROM top2k t JOIN nb USING (vec_id)
        |ORDER BY t.score DESC, t.vec_id LIMIT 10""".stripMargin),

    // filtered variant (`tensor_unified/src/lib.rs:966-1014`): graph
    // constraint ∩ user metadata filter before ranking.
    "u03_similar_connected_filtered" -> QDef(
      (s, d) => {
        val top2k = emb(s, d).filter(col("vec_id") =!= 0 && col("vec_id") % 2 === 0)
          .crossJoin(broadcast(qv(s, d, 0)))
          .select(col("vec_id"),
            round(cosine_similarity(col("embedding"), col("qv")), 4).as("score"))
          .orderBy(desc("score"), col("vec_id")).limit(20)
        top2k.join(neighbors(s, d, 1), Seq("vec_id"))
          .orderBy(desc("score"), col("vec_id")).limit(10)
          .select("vec_id", "score")
      },
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |el AS (SELECT label AS elabel FROM embeddings WHERE vec_id = 1),
        |top2k AS (
        |  SELECT e.vec_id,
        |    round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),4) AS score
        |  FROM embeddings e, q WHERE e.vec_id <> 0 AND e.vec_id % 2 = 0
        |  ORDER BY score DESC, e.vec_id LIMIT 20),
        |nb AS (SELECT vec_id FROM embeddings, el WHERE label = elabel AND vec_id <> 1)
        |SELECT t.vec_id, t.score FROM top2k t JOIN nb USING (vec_id)
        |ORDER BY t.score DESC, t.vec_id LIMIT 10""".stripMargin),

    // NEIGHBORS 'vec:1' BY SIMILARITY TO <query vector> — rank e's graph
    // neighbors by similarity to a query embedding
    // (`tensor_unified/src/lib.rs:1021-1050`).
    "u04_neighbors_by_similarity" -> QDef(
      (s, d) => neighbors(s, d, 1)
        .join(emb(s, d), Seq("vec_id"))
        .crossJoin(broadcast(qv(s, d, 2)))
        .select(col("vec_id"),
          round(cosine_similarity(col("embedding"), col("qv")), 4).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(10),
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 2),
        |el AS (SELECT label AS elabel FROM embeddings WHERE vec_id = 1)
        |SELECT e.vec_id,
        |  round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]),4) AS score
        |FROM embeddings e, q, el WHERE e.label = elabel AND e.vec_id <> 1
        |ORDER BY score DESC, e.vec_id LIMIT 10""".stripMargin),

    // Hybrid retrieval with reciprocal-rank fusion (RRF, k=60): the
    // cross-engine "keyword search + vector search, one ranked answer"
    // operator. Each side independently produces its top-20 as a
    // TakeOrderedAndProject (no global sort of the corpus — rank lists
    // are small BY CONSTRUCTION, which is what makes RRF scale: fusing
    // happens on ≤ 2k rows no matter how big the corpus is). Text side:
    // term frequency of 'join' over documents; vector side: cosine to
    // embedding 0; documents and embeddings share the id space. Fused
    // score is an INTEGER sum of round(1e6/(60+rank)) per side (absent
    // rank contributes 0 — standard RRF over the union of lists), so the
    // compare is exact. (Also the engine behind the NQL HYBRID statement.)
    "u05_hybrid_rrf" -> QDef(
      (s, d) => hybridRrf(s, d, "join", 0, 10),
      """WITH tf AS (SELECT doc_id,
        |        len(list_filter(regexp_split_to_array(text, '\s+'), w -> w = 'join')) AS tf
        |      FROM documents),
        |tr AS (SELECT doc_id, row_number() OVER (ORDER BY tf DESC, doc_id) AS rt
        |       FROM tf QUALIFY rt <= 20),
        |q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |vs AS (SELECT e.vec_id,
        |         round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS score
        |       FROM embeddings e, q),
        |vr AS (SELECT vec_id, row_number() OVER (ORDER BY score DESC, vec_id) AS rv
        |       FROM vs QUALIFY rv <= 20)
        |SELECT coalesce(tr.doc_id, vr.vec_id) AS id,
        |  coalesce(CAST(round(1e6 / (60 + rt), 0) AS BIGINT), 0)
        |    + coalesce(CAST(round(1e6 / (60 + rv), 0) AS BIGINT), 0) AS rrf_ppm
        |FROM tr FULL OUTER JOIN vr ON tr.doc_id = vr.vec_id
        |ORDER BY rrf_ppm DESC, id LIMIT 10""".stripMargin),

    // FIND PATH statement end-to-end (reference FindPattern::Path,
    // `neumann_parser/src/ast.rs:784-792`; executor
    // `tensor_unified/src/lib.rs:1154-1240`): shortest path customer →
    // its region, which the TPC-H topology makes unique (customer has one
    // tree edge to its nation; the region sits one hop above) — so the
    // oracle can reconstruct the exact hop list from the base tables.
    "u06_find_path" -> QDef(
      (s, d) => graft.nql.Nql.execute(s, d,
        "FIND PATH FROM 'customer:7' TO 'region:2'"),
      """SELECT 0 AS hop, 'customer:7' AS key
        |UNION ALL
        |SELECT 1, 'nation:' || CAST(c_nationkey AS VARCHAR)
        |FROM customer WHERE c_custkey = 7
        |UNION ALL
        |SELECT 2, 'region:' || CAST(n_regionkey AS VARCHAR)
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |WHERE c_custkey = 7
        |ORDER BY hop""".stripMargin)
  )
}
