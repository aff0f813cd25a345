package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors — the second scale
  * path for similarity search besides hyperplane LSH (SURVEY.md §2.C 31
  * names it as the ANN alternative): a KMeans coarse quantizer partitions
  * the corpus into NumCentroids cells; each query probes its NProbe
  * closest cells and reranks those candidates exactly.
  *
  * Scale shape: clustering cost is one ML fit (sampled at real scale);
  * search cost is |Q| × (NumCentroids centroid dots + corpus/NumCentroids
  * × NProbe rerank dots) — the classic recall/cost dial. The cell
  * assignment is a corpus-partitioning key, so at 100 TB the index is a
  * bucketed table on `cluster` and a probe is a partition-pruned scan.
  */
object Ivf {

  val NumCentroids = 16
  val NProbe = 4
  val Seed = 42L

  /** corpus with unit vectors and KMeans cell assignment. */
  def assign(embeddings: DataFrame): (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val unit = Similarity.withNorm(embeddings)
      .withColumn("u", expr("transform(vd, x -> x / norm)"))
      .withColumn("fv", array_to_vector(col("u")))
    val model = new KMeans()
      .setK(NumCentroids).setSeed(Seed)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(unit)
    val assigned = model.transform(unit)
      .select(col("vec_id"), col("label"), col("u"), col("cluster"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq
      .toDF("cluster", "cvec")
    (assigned, centroids)
  }

  /** ANN top-k: probe the NProbe nearest cells per query, exact cosine
    * rerank inside them. Unit vectors make dot == cosine. */
  def knnCosineIvf(embeddings: DataFrame, k: Int = Similarity.KnnK): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val (assigned, centroids) = assign(embeddings)
    val queries = assigned.filter(col("vec_id") % Similarity.QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("cdot").desc, col("cluster"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cdot", expr("graft_dot(qu, cvec)"))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= NProbe)
      .select("query_id", "qu", "cluster")
    val wRank = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    probes.join(assigned, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("graft_dot(u, qu)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        Parity.r("cos", 4), col("label"))
  }

  def knnCosineIvfQ(embeddings: DataFrame): DataFrame =
    knnCosineIvf(embeddings).orderBy("query_id", "rank")
}
