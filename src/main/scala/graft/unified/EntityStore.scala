package graft.unified

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Writable unified entity store (reference ENTITY CREATE/UPDATE/DELETE/
  * CONNECT + EMBED STORE + NODE/EDGE CREATE —
  * `tensor_unified/src/lib.rs:475-880`), rebuilt as a lakehouse append
  * log: every mutation appends a versioned parquet batch; readers take
  * latest-wins per key. No in-place mutation, no locks — the pattern that
  * scales to many concurrent writers on object storage. Compaction =
  * rewrite of the latest view (`compact()`).
  */
final class EntityStore(spark: SparkSession, path: String) {
  import EntityStore._

  private val entityDir = s"$path/entities"
  private val edgeDir = s"$path/edges"
  private val seq = new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis() * 1000)

  private def nextSeq(): Long = seq.incrementAndGet()

  /** Write-path mutual exclusion for READ-MERGE-APPEND statements
    * (ENTITY UPDATE, EMBED STORE, NODE BATCH UPDATE, Cypher MATCH…SET):
    * their merge reads the latest row, folds props, and appends — two
    * interleaved merges on one key would both read the same pre-image
    * and the second append would silently drop the first's assignment
    * (lost update). Executors holding this monitor serialize those
    * statement bodies, so within one process the merge is atomic and
    * lost updates are impossible (spec-pinned,
    * EntityStoreConcurrencySpec). Plain appends (CREATE / DELETE /
    * CONNECT) don't need it — they are order-insensitive latest-wins
    * records that never read.
    *
    * CROSS-PROCESS contract (documented, COVERAGE.md): the store is
    * single-writer-process. The reference engine is single-threaded
    * (`tensor_unified/src/lib.rs` holds `&mut self` for every mutation)
    * and has no sharper guarantee; a multi-process deployment would
    * hoist this monitor to a storage-layer conditional-put (object-store
    * CAS or a lakehouse table format's optimistic commit), which the
    * append-log layout already accommodates — merge statements re-read
    * and retry on conflict without rewriting history. */
  private[this] val mergeLock = new Object
  def withMergeLock[A](f: => A): A = mergeLock.synchronized(f)

  /** Create or fully replace entities (props + optional embedding). */
  def put(rows: Seq[EntityRow]): Unit = append(rows.map(r => (r.key, r.props, r.embedding, false)))

  /** Tombstone: the key disappears from the latest view. */
  def delete(keys: Seq[String]): Unit = append(keys.map(k => (k, Map.empty[String, String], None, true)))

  private def append(rows: Seq[(String, Map[String, String], Option[Array[Float]], Boolean)]): Unit = {
    val s = nextSeq()
    // All rows in one batch share a seq, so duplicate keys inside a batch
    // would tie in the latest-wins window and survive nondeterministically.
    // Dedupe last-wins here (batch order = statement order) so the row the
    // user wrote last is the one that wins, deterministically.
    val lastWins = rows.zipWithIndex
      .groupBy(_._1._1).values.map(_.maxBy(_._2)._1).toSeq
    val data = lastWins.map { case (k, p, e, del) => (k, p, e.orNull, del, s) }
    spark.createDataFrame(data)
      .toDF("key", "props", "embedding", "deleted", "seq")
      .write.mode(SaveMode.Append).parquet(entityDir)
  }

  /** Directed typed edge between entity keys. */
  def connect(src: String, dst: String, etype: String): Unit =
    connectBatch(Seq((src, dst, etype)))

  /** Batch edge create: ONE versioned log append for the whole batch
    * (reference batch graph DML, `graph_engine/src/lib.rs:8027-8380`). */
  def connectBatch(edges: Seq[(String, String, String)]): Unit = {
    val s = nextSeq()
    // Same-batch duplicate edge identities: last occurrence wins (see append).
    val lastWins = edges.zipWithIndex
      .groupBy(_._1).values.map(_.maxBy(_._2)._1).toSeq
    spark.createDataFrame(lastWins.map { case (src, dst, et) => (src, dst, et, false, s) })
      .toDF("src", "dst", "etype", "deleted", "seq")
      .write.mode(SaveMode.Append).parquet(edgeDir)
  }

  def disconnect(src: String, dst: String, etype: String): Unit =
    spark.createDataFrame(Seq((src, dst, etype, true, nextSeq())))
      .toDF("src", "dst", "etype", "deleted", "seq")
      .write.mode(SaveMode.Append).parquet(edgeDir)

  // A store that has never been written has no parquet dir yet — read as
  // empty rather than failing, so overlay views (NODE GET over base ∪
  // store) work on a fresh store. Existence is probed through the Hadoop
  // FileSystem API so non-local store paths (hdfs://, s3a://) behave the
  // same as file:// ones.
  private def readLog(dir: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(dir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Latest record per key, tombstones included. */
  private def latestEntities: DataFrame = {
    val w = Window.partitionBy("key").orderBy(desc("seq"))
    readLog(entityDir, StructType(Seq(
      StructField("key", StringType), StructField("props", MapType(StringType, StringType)),
      StructField("embedding", ArrayType(FloatType)), StructField("deleted", BooleanType),
      StructField("seq", LongType))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "seq")
  }

  /** Latest record per (src, dst, etype), tombstones included. */
  private def latestEdges: DataFrame = {
    val w = Window.partitionBy("src", "dst", "etype").orderBy(desc("seq"))
    readLog(edgeDir, StructType(Seq(
      StructField("src", StringType), StructField("dst", StringType),
      StructField("etype", StringType), StructField("deleted", BooleanType),
      StructField("seq", LongType))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "seq")
  }

  /** Latest-wins live view of entities. */
  def entities: DataFrame = latestEntities.filter(!col("deleted")).drop("deleted")

  /** Latest-wins live view of edges. */
  def edges: DataFrame = latestEdges.filter(!col("deleted")).drop("deleted")

  /** Keys whose latest record is a tombstone — overlay readers anti-join
    * their base relation against these so a delete masks base rows too. */
  def deletedKeys: DataFrame = latestEntities.filter(col("deleted")).select("key")

  /** Edge identities whose latest record is a tombstone. */
  def deletedEdges: DataFrame = latestEdges.filter(col("deleted")).select("src", "dst", "etype")

  /** 1-hop neighbors (out + in). */
  def neighbors(key: String): DataFrame = {
    val e = edges
    e.filter(col("src") === key).select(col("dst").as("key"), col("etype"))
      .union(e.filter(col("dst") === key).select(col("src").as("key"), col("etype")))
  }

  /** Brute-force top-k cosine against a stored entity's embedding. */
  def similar(key: String, k: Int): DataFrame = {
    val q = entities.filter(col("key") === key)
      .select(col("embedding").as("qv")).limit(1)
    entities.filter(col("key") =!= key && col("embedding").isNotNull)
      .crossJoin(broadcast(q))
      .select(col("key"), round(cosine_similarity(col("embedding"), col("qv")), 4).as("score"))
      .orderBy(desc("score"), col("key")).limit(k)
  }

  /** SIMILAR k CONNECTED TO e over the live store (2× oversample). */
  def similarConnectedTo(key: String, e: String, k: Int): DataFrame =
    similar(key, 2 * k)
      .join(neighbors(e).select("key").distinct(), Seq("key"))
      .orderBy(desc("score"), col("key")).limit(k)

  /** Rewrite the logs down to one record per key (bounds read
    * amplification). Tombstones are KEPT, not dropped: since deletes also
    * mask the derived base graph (`deletedKeys`/`deletedEdges`), dropping
    * them here would resurrect deleted base rows on the next read. */
  def compact(): Unit = {
    val ent = latestEntities.withColumn("seq", lit(nextSeq()))
    val tmpE = s"$entityDir.compact"
    ent.write.mode(SaveMode.Overwrite).parquet(tmpE)
    spark.read.parquet(tmpE).write.mode(SaveMode.Overwrite).parquet(entityDir)
    val ed = latestEdges.withColumn("seq", lit(nextSeq()))
    val tmpD = s"$edgeDir.compact"
    ed.write.mode(SaveMode.Overwrite).parquet(tmpD)
    spark.read.parquet(tmpD).write.mode(SaveMode.Overwrite).parquet(edgeDir)
  }
}

object EntityStore {
  final case class EntityRow(key: String, props: Map[String, String], embedding: Option[Array[Float]])
}
