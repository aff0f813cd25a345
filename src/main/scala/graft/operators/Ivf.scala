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

  /** Why this operator is rows-only (SURVEY §2): a brute-oracle gate would
    * need recall exactly 1 at the driver, but the KMeans cell assignment
    * depends on input partitioning (seeded init samples per partition), so
    * the minimal sufficient probe width is environment-dependent — measured
    * at sf0.01: recall 1 from nProbe=10 under local[8], yet nProbe=12 still
    * missed one true neighbor under local[4]. On this unclustered synthetic
    * corpus (top cosine ~0.5, no cluster structure) recall<1 at any fixed
    * sub-full probe width is inherent-and-unstable. The spec therefore pins
    * (a) recall at the production width and (b) EXACT brute equality at
    * nProbe = NumCentroids, which is partitioning-independent and proves
    * the probe/dedup/rerank machinery loses nothing. */

  /** corpus with unit vectors and KMeans cell assignment. Keeps the raw
    * double vector + norm beside the unit vector: probing uses the unit
    * form, but the rerank cosine is computed from (vd, norm) with the SAME
    * expression as the brute operator, so agreeing candidate sets give
    * bit-identical output. */
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
      .select(col("vec_id"), col("label"), col("vd"), col("norm"), col("u"), col("cluster"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray.toSeq) }.toSeq
      .toDF("cluster", "cvec")
    (assigned, centroids)
  }

  /** Prebuilt IVF index: the quantized corpus plus its centroid table.
    * At 100 TB this is built once and PERSISTED as a table bucketed by
    * `cluster` (a probe is then a partition-pruned scan); locally the
    * assignment is checkpointed so repeated searches don't refit KMeans. */
  case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  def buildIndex(embeddings: DataFrame): IvfIndex = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val (assigned, centroids) = assign(embeddings)
    IvfIndex(assigned.localCheckpoint(), centroids)
  }

  /** ANN top-k over a prebuilt index: probe the nProbe nearest cells per
    * query, exact cosine rerank inside them (brute-identical cosine
    * expression). */
  def searchIndex(index: IvfIndex, k: Int = Similarity.KnnK,
                  nProbe: Int = NProbe): DataFrame = {
    val IvfIndex(assigned, centroids) = index
    val queries = assigned.filter(col("vec_id") % Similarity.QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("u").as("qu"),
        col("vd").as("qv"), col("norm").as("qn"))
    val wProbe = Window.partitionBy("query_id").orderBy(col("cdot").desc, col("cluster"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cdot", expr("graft_dot(qu, cvec)"))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= nProbe)
      .select("query_id", "qv", "qn", "cluster")
    val wRank = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    probes.join(assigned, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr(s"${Similarity.DotF} / (norm * qn)"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        Parity.r("cos", 4), col("label"))
  }

  /** One-shot convenience: fit + search in a single call. */
  def knnCosineIvf(embeddings: DataFrame, k: Int = Similarity.KnnK,
                   nProbe: Int = NProbe): DataFrame = {
    graft.functions.VectorExprs.register(embeddings.sparkSession)
    val (assigned, centroids) = assign(embeddings)
    searchIndex(IvfIndex(assigned, centroids), k, nProbe)
  }

  def knnCosineIvfQ(embeddings: DataFrame): DataFrame =
    knnCosineIvf(embeddings).orderBy("query_id", "rank")
}
