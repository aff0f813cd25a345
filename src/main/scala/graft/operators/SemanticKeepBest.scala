package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** SemDeDup-style CANONICAL CHOICE for semantic clusters (round 8,
  * continuation) — the embedding-side member of the keep-best family,
  * completing the symmetry [[Dedup.dedupClusterKeepBest]] established for
  * shingle clusters: [[Similarity.embeddingClusters]] groups near-dup
  * vectors, and the member a pipeline KEEPS is the most REPRESENTATIVE
  * one — the vector closest to its cluster's centroid (SemDeDup's actual
  * selection rule; Abbas et al. 2023 §3) — not the min id.
  *
  * §6 composition: the per-cluster centroid reuses [[EmbeddingOutlier]]'s
  * integer algebra verbatim — µ-unit quantized components summed as
  * exact BIGINTs (associative, partitioning-independent; cosine is
  * scale-invariant so the UN-divided sum vector IS the centroid) — and
  * the RANK key is the Parity-ROUNDED cosine (6 decimals, the
  * quality_select rounded-rank-key rule) with vec_id tie-break, so the
  * kept member is a cross-engine-deterministic function of the data
  * even where raw doubles would tie within an ulp. Singleton clusters
  * keep themselves at cosine 1 (own centroid).
  *
  * Scale shape: the µ-vector ⋈ cluster-label frame feeds the centroid
  * aggregation AND the scoring join — two consumers above the expensive
  * CC/pair upstream, so it is localCheckpoint'd (the invariant's
  * textbook case; the CC labels themselves come back already
  * materialized from propagateMinLabels). Centroid agg is map-side
  * combinable (64·|clusters| rows); the per-cluster window partitions
  * are near-dup-cluster-sized (tiny by construction); the pair stage's
  * cost is [[Similarity.embeddingDedup]]'s documented exact contract
  * (at 100 TB the LSH bucket index generates the same candidates).
  */
object SemanticKeepBest {

  def semanticKeepBest(embeddings: DataFrame): DataFrame =
    semanticKeepBestOn(embeddings,
      Similarity.embeddingClusters(embeddings))

  /** Same selection over a caller-supplied cluster frame — lets the
    * LSH-built clusters ([[Similarity.embeddingClustersLsh]]) drive the
    * identical keep-best (cross-checked in AnnOracleSpec: identical
    * labels ⇒ identical kept members, verified row-for-row). */
  def semanticKeepBestOn(embeddings: DataFrame,
                         clusterFrame: DataFrame): DataFrame = {
    val clusters = clusterFrame
      .select(col("vec_id"), col("cluster_id"))
    val e = embeddings
      .repartition(col("vec_id"))
      .select(col("vec_id"), expr(EmbeddingOutlier.IntVecExpr).as("vi"))
      .join(clusters, Seq("vec_id"))
      .localCheckpoint()
    val cent = e
      .select(col("cluster_id"), posexplode(col("vi")).as(Seq("pos", "x")))
      .groupBy("cluster_id", "pos").agg(sum("x").as("s"))
      .groupBy("cluster_id")
      .agg(expr("transform(sort_array(collect_list(struct(pos, s))), p -> p.s)").as("ci"))
    val w = Window.partitionBy("cluster_id").orderBy(col("rk").desc, col("vec_id"))
    e.join(cent, Seq("cluster_id"))
      .withColumn("dot", expr(EmbeddingOutlier.fold("zip_with(vi, ci, (a, b) -> a * b)")))
      .withColumn("nv2", expr(EmbeddingOutlier.fold("transform(vi, x -> x * x)")))
      .withColumn("nc2", expr(EmbeddingOutlier.fold("transform(ci, x -> x * x)")))
      .withColumn("cos_centroid",
        expr("CAST(dot AS DOUBLE) / (sqrt(CAST(nv2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE)))"))
      .withColumn("rk", expr("CAST(round(cos_centroid * 1000000.0) AS BIGINT)"))
      .withColumn("rank", row_number().over(w))
      .withColumn("is_kept", col("rank") === 1)
      .select(col("vec_id"), col("cluster_id"), r("cos_centroid", 6),
        col("rank"), col("is_kept"))
  }

  def semanticKeepBestQ(embeddings: DataFrame): DataFrame =
    semanticKeepBest(embeddings).orderBy("vec_id")

  /** Oracle: the cluster closure chain (one text with embedding_cluster)
    * + EmbeddingOutlier's µ-int centroid algebra at cluster granularity
    * + the same rounded rank key. */
  val semanticKeepBestSql: String = {
    val scale = EmbeddingOutlier.Scale
    s"""WITH RECURSIVE ${Similarity.clusterChainBody}, mi AS (
       |  SELECT em.vec_id, cc.cluster_id,
       |         [CAST(round(CAST(x AS DOUBLE) * $scale.0) AS BIGINT) for x in em.embedding] AS vi
       |  FROM embeddings em JOIN cc ON cc.doc = em.vec_id
       |), comp AS (
       |  SELECT cluster_id, i AS pos, CAST(sum(vi[i]) AS BIGINT) AS s
       |  FROM mi, unnest(range(1, len(vi) + 1)) AS t(i)
       |  GROUP BY 1, 2
       |), cent AS (
       |  SELECT cluster_id, list(s ORDER BY pos) AS ci FROM comp GROUP BY 1
       |), scored AS (
       |  SELECT mi.vec_id, mi.cluster_id,
       |         list_reduce([vi[i] * ci[i] for i in range(1, len(vi) + 1)], (a, b) -> a + b) AS dot,
       |         list_reduce([vi[i] * vi[i] for i in range(1, len(vi) + 1)], (a, b) -> a + b) AS nv2,
       |         list_reduce([ci[i] * ci[i] for i in range(1, len(ci) + 1)], (a, b) -> a + b) AS nc2
       |  FROM mi JOIN cent ON mi.cluster_id = cent.cluster_id
       |), cosd AS (
       |  SELECT vec_id, cluster_id,
       |         CAST(dot AS DOUBLE) / (sqrt(CAST(nv2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE))) AS cos_centroid
       |  FROM scored
       |), ranked AS (
       |  SELECT vec_id, cluster_id, cos_centroid,
       |         CAST(row_number() OVER (
       |           PARTITION BY cluster_id
       |           ORDER BY CAST(round(cos_centroid * 1000000.0) AS BIGINT) DESC, vec_id
       |         ) AS INT) AS rank
       |  FROM cosd
       |)
       |SELECT vec_id, cluster_id, ${rsql("cos_centroid", 6, "cos_centroid")},
       |       rank, rank = 1 AS is_kept
       |FROM ranked
       |ORDER BY vec_id""".stripMargin
  }
}
