package graft.vector

import graft.functions.VectorFunctions._
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, Tokenizer}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib-backed approximate indexes — the scale path next to the exact
  * brute-force operators (reference IVF `vector_engine/src/lib.rs:2647-2860`
  * and HNSW, which is intentionally not ported — SURVEY §1.4).
  *
  * KMeans-IVF: cells learned by MLlib KMeans; a query probes the nprobe
  * nearest cells and ranks exactly inside them — at 100 TB the cell id is
  * a partition column and probing prunes partitions.
  */
object AnnIndex {

  private val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))

  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** Cluster embeddings into k cells (deterministic via fixed seed). */
  def buildIvf(emb: DataFrame, k: Int, seed: Long = 42L): IvfIndex = {
    val feat = emb.withColumn("features", toVec(col("embedding")))
    val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(feat)
    val assigned = model.transform(feat)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
    val cents = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    val centroids = emb.sparkSession.createDataFrame(cents.toSeq).toDF("cell", "centroid")
    IvfIndex(assigned, centroids)
  }

  /** Probe the `nprobe` nearest cells, exact cosine rank inside them. */
  def searchIvf(index: IvfIndex, query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    val q = spark.createDataFrame(Seq(Tuple1(query))).toDF("qv")
    val cells = index.centroids.crossJoin(broadcast(q))
      .select(col("cell"), cosine_similarity(col("centroid"), col("qv")).as("cs"))
      .orderBy(desc("cs"), col("cell")).limit(nprobe)
      .select("cell")
    index.assigned.join(broadcast(cells), Seq("cell"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine_similarity(col("embedding"), col("qv")), 4).as("score"))
      .orderBy(desc("score"), col("vec_id")).limit(k)
  }

  /** MLlib MinHashLSH near-dup candidate pairs over document word sets.
    * Returns (da, db, jaccardDist) with da < db for pairs with Jaccard
    * distance ≤ maxDist.
    */
  def minHashNearDups(docs: DataFrame, maxDist: Double, numHashTables: Int = 8): DataFrame = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val tf = new HashingTF().setInputCol("words").setOutputCol("features")
      .setNumFeatures(1 << 16).setBinary(true)
    val featured = tf.transform(tok.transform(docs.select("doc_id", "text")))
      .filter(udf((v: MlVector) => v.numNonzeros > 0).apply(col("features")))
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(featured)
    model.approxSimilarityJoin(featured, featured, maxDist, "jaccardDist")
      .select(col("datasetA.doc_id").as("da"), col("datasetB.doc_id").as("db"),
        round(col("jaccardDist"), 4).as("jaccardDist"))
      .filter(col("da") < col("db"))
      .orderBy("da", "db")
  }
}
