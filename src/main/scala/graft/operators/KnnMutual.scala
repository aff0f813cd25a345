package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** MUTUAL k-NN pairs (round 13) — the standard near-duplicate GRAPH
  * builder the one-directional family implies: [[Similarity
  * .knnCosineBrute]] answers "who are my neighbors", [[Similarity
  * .embeddingDedup]] "who crosses a global threshold"; mutual-kNN keeps
  * the pair (a, b) only when EACH is in the OTHER's top-k — the
  * asymmetric-hub filter (a cluster centroid is everyone's neighbor
  * but reciprocates only its true peers), the edge set semantic-dedup
  * and graph-clustering pipelines actually build on (public: mutual
  * kNN graphs, e.g. Brito et al. 1997).
  *
  * §6 / determinism: cosines ride the established bit-identical fold
  * ([[Similarity.withNorm]]'s left-assoc dot, one shared formula text);
  * ranks are row_number over the total (cos DESC, id) order; cos(a,b)
  * is computed once per DIRECTION and is bit-identical both ways
  * (per-element products commute, same summation order), so the pair
  * carries the id1-side value. Emission is the canonical id1 < id2 row
  * with BOTH ranks — the asymmetry survives as data.
  *
  * Scale shape: the ranked top-k frame is the [[Similarity
  * .knnCosineBrute]] contract over ALL vectors (corpus×corpus dot
  * products — inherent to the exact contract; the LSH bucket join is
  * the 100 TB candidate path exactly as for the threshold miner, with
  * this as its recall oracle). After the rank filter the frame is
  * n·k rows — the mutual join is tiny and self-joins the CHECKPOINTED
  * frame (2 consumers per the invariant). */
object KnnMutual {

  val K = 5

  def knnMutual(embeddings: DataFrame, k: Int = K): DataFrame = {
    val e = Similarity.withNorm(embeddings)
    val a = e.select(col("vec_id").as("src"), col("vd"), col("norm"))
    val b = e.select(col("vec_id").as("dst"), col("vd").as("qv"),
      col("norm").as("qn"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    val ranked = a.join(b, col("src") =!= col("dst"))
      .withColumn("cos", expr(s"${Similarity.DotF} / (norm * qn)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("src", "dst", "rank", "cos")
      .localCheckpoint() // 2 consumers: both sides of the mutual join
    ranked
      .filter(col("src") < col("dst"))
      .select(col("src").as("id1"), col("dst").as("id2"),
        col("rank").cast("long").as("rank12"), col("cos"))
      .join(ranked.filter(col("src") > col("dst"))
        .select(col("dst").as("id1"), col("src").as("id2"),
          col("rank").cast("long").as("rank21")), Seq("id1", "id2"))
      .select("id1", "id2", "rank12", "rank21", "cos")
  }

  def knnMutualQ(embeddings: DataFrame): DataFrame =
    knnMutual(embeddings)
      .select(col("id1"), col("id2"), col("rank12"), col("rank21"), r("cos", 4))
      .orderBy("id1", "id2")

  /** Chain ending at `topk(src, dst, cos, rank)` — the per-direction
    * top-k lists; composed by [[knnMutualSql]] and the cluster oracle. */
  private lazy val topkChainBody: String =
    s"""scored AS (
       |  SELECT a.vec_id AS src, q.vec_id AS dst,
       |         ${Similarity.DotSqlF} / (a.norm * q.norm) AS cos
       |  FROM n a JOIN n q ON a.vec_id <> q.vec_id
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY src
       |              ORDER BY cos DESC, dst) AS BIGINT) AS rank
       |  FROM scored
       |), topk AS (
       |  SELECT * FROM ranked WHERE rank <= $K
       |)""".stripMargin

  val knnMutualSql: String =
    s"""${Similarity.VecCte}, $topkChainBody
       |SELECT f.src AS id1, f.dst AS id2,
       |       f.rank AS rank12, g.rank AS rank21,
       |       ${rsql("f.cos", 4, "cos")}
       |FROM topk f JOIN topk g ON f.src = g.dst AND f.dst = g.src
       |WHERE f.src < f.dst
       |ORDER BY id1, id2""".stripMargin

  /** CONNECTED COMPONENTS over the mutual-kNN graph (round 13) — the
    * classic density-adaptive clustering the mutual filter exists for
    * (Brito et al. 1997): unlike [[Similarity.embeddingClusters]]'
    * global cosine threshold, the mutual graph adapts to LOCAL density
    * (a sparse region's reciprocal neighbors cluster at cosines a dense
    * region would reject), and the hub filter keeps centroids from
    * welding unrelated clusters into one giant component. Same
    * pointer-jumping CC machinery ([[Dedup.propagateMinLabels]],
    * O(log d) rounds, per-round checkpoint), same recursive-closure
    * oracle technique; min-id labels, `is_canonical` convention. */
  def knnMutualClusters(embeddings: DataFrame, k: Int = K,
                        maxIters: Int = 20): DataFrame = {
    val pairs = knnMutual(embeddings, k)
      .select(col("id1"), col("id2")).localCheckpoint()
    val edges = pairs
      .unionAll(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
    val vertices = embeddings.select(col("vec_id").as("doc_id"))
    val (labels, _) = Dedup.propagateMinLabels(vertices, edges, maxIters)
    labels
      .select(col("doc_id").as("vec_id"), col("label").as("cluster_id"))
      .withColumn("is_canonical", col("vec_id") === col("cluster_id"))
  }

  def knnMutualClustersQ(embeddings: DataFrame): DataFrame =
    knnMutualClusters(embeddings).orderBy("vec_id")

  val knnMutualClustersSql: String =
    s"""WITH RECURSIVE ${Similarity.VecCteBody}, $topkChainBody, mpairs AS (
       |  SELECT f.src AS id1, f.dst AS id2
       |  FROM topk f JOIN topk g ON f.src = g.dst AND f.dst = g.src
       |  WHERE f.src < f.dst
       |), edges AS (
       |  SELECT id1 AS u, id2 AS v FROM mpairs
       |  UNION ALL
       |  SELECT id2 AS u, id1 AS v FROM mpairs
       |), reach AS (
       |  SELECT vec_id AS doc, vec_id AS r FROM embeddings
       |  UNION
       |  SELECT e.u AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.v
       |), cc AS (
       |  SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc
       |)
       |SELECT em.vec_id, cc.cluster_id, em.vec_id = cc.cluster_id AS is_canonical
       |FROM embeddings em JOIN cc ON cc.doc = em.vec_id
       |ORDER BY em.vec_id""".stripMargin
}
