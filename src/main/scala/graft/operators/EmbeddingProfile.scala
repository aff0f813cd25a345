package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EMBEDDING-COLUMN PROFILE (round 8, continuation 5) — the
  * [[TableProfile]] idea applied to the vector column: per label,
  * vector count, dimension min/max (a dim mismatch is the #1
  * embedding-pipeline corruption and must surface as data, not as a
  * downstream shape error), zero-norm count (dead/failed encodes),
  * norm² and component ranges. The arrival gate an embedding drop
  * passes BEFORE [[Similarity]] / [[Ivf]] / [[EmbeddingDrift]] trust
  * its vectors — those operators assume what this one verifies.
  *
  * Cross-engine exactness (SURVEY §6, the µ-unit discipline of
  * [[EmbeddingDrift]]): components quantize to µ-units
  * (`round(x·10⁶)` BIGINT) for per-row norm² and component extrema —
  * per-row products are bounded (|q| ≤ ~2·10⁶ ⇒ q² ≤ 4·10¹², ×dim
  * well under 2⁶³) and min/max never sum across rows. The corpus-wide
  * norm² SUM instead uses milli-unit quantization (q² ≤ 4·10⁶·dim per
  * row) so the per-label total stays in BIGINT up to 10⁹ vectors —
  * sums and squares take different quantizations BECAUSE their
  * overflow domains differ. Integer sums are order-free, so no fold
  * association contract is needed (unlike the float dot products).
  *
  * Scale shape: pure map pass (transform + bounded per-row folds)
  * into one |labels|-sized map-side-combinable aggregation; zero
  * joins, zero windows. The repartition spreads the single-file
  * local table ([[Similarity.withNorm]] invariant; a no-op on a real
  * multi-file corpus).
  */
object EmbeddingProfile {

  def embeddingProfile(embeddings: DataFrame): DataFrame = {
    val q = embeddings
      .repartition(col("vec_id"))
      .withColumn("qu",
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"))
      .withColumn("qm",
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))"))
      .withColumn("norm2_u", expr("aggregate(qu, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
      .withColumn("norm2_m", expr("aggregate(qm, CAST(0 AS BIGINT), (a, x) -> a + x * x)"))
    q.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        min(size(col("embedding"))).as("dim_min"),
        max(size(col("embedding"))).as("dim_max"),
        sum(expr("CASE WHEN norm2_u = 0 THEN 1 ELSE 0 END")).as("zero_norm"),
        min("norm2_u").as("min_norm2_u"), max("norm2_u").as("max_norm2_u"),
        sum("norm2_m").as("sum_norm2_m"),
        min(expr("array_min(qu)")).as("comp_min_u"),
        max(expr("array_max(qu)")).as("comp_max_u"))
  }

  def embeddingProfileQ(embeddings: DataFrame): DataFrame =
    embeddingProfile(embeddings).orderBy("label")

  val embeddingProfileSql: String =
    """WITH q AS (
      |  SELECT label, len(embedding) AS dim,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qu,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qm
      |  FROM embeddings
      |), f AS (
      |  SELECT label, dim,
      |         CAST(coalesce(list_sum(list_transform(qu, x -> x * x)), 0) AS BIGINT) AS norm2_u,
      |         CAST(coalesce(list_sum(list_transform(qm, x -> x * x)), 0) AS BIGINT) AS norm2_m,
      |         list_min(qu) AS cmin, list_max(qu) AS cmax
      |  FROM q
      |)
      |SELECT label,
      |       CAST(count(*) AS BIGINT) AS n_vecs,
      |       min(dim) AS dim_min, max(dim) AS dim_max,
      |       CAST(sum(CASE WHEN norm2_u = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_norm,
      |       min(norm2_u) AS min_norm2_u, max(norm2_u) AS max_norm2_u,
      |       CAST(sum(norm2_m) AS BIGINT) AS sum_norm2_m,
      |       min(cmin) AS comp_min_u, max(cmax) AS comp_max_u
      |FROM f
      |GROUP BY 1
      |ORDER BY label""".stripMargin
}
