package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Semantic outlier scoring (round 8, continuation) — the embedding-side
  * QUALITY filter the dedup family doesn't cover: score every vector by
  * cosine to its LABEL CENTROID and flag the per-label bottom-K. Mislabeled
  * / off-distribution items rank first — the standard semantic-curation
  * pass (SemDeDup-style pruning keeps near-duplicates; THIS catches the
  * opposite tail, items far from their own cluster).
  *
  * Cross-engine exactness (§6): a centroid is a SUM ACROSS ROWS, and
  * cross-row float sums are order-dependent — the one thing no partitioned
  * engine can pin. So every component is QUANTIZED to integer µ-units
  * (`round(x·10⁶)` → BIGINT, scale-0 round agrees across engines) and the
  * centroid, dot products, and squared norms are all exact INTEGER sums —
  * associative, order-free, bit-identical on any partitioning. Cosine is
  * scale-invariant, so the un-divided component-sum vector IS the
  * centroid for scoring purposes; doubles appear only in the final
  * `dot / (sqrt·sqrt)` (IEEE sqrt/divide are correctly rounded —
  * deterministic). Bounds: |x| ≤ 1 → component ≤ 10⁶, a 10⁹-row label
  * sums to ≤ 10¹⁵ and the dot adds 6 more digits — DECIMAL(38,0) is the
  * escape hatch beyond that, same bit-identity.
  *
  * Scale shape: posexplode over the corpus → (label, pos) partial-agg sum
  * (map-side combinable, 64·|labels| result rows) → centroid arrays
  * rebuilt with a deterministic sort_array(collect_list(struct)) → joined
  * back on `label` (|labels|-row build side, AQE broadcasts — bounded by
  * the label catalog, never corpus-proportional) → fused map pass for the
  * integer folds → one per-label window for the bottom-K rank. The vector
  * itself is included in its centroid (at |label| ≫ 1 the self-term is
  * negligible; excluding it would make the centroid per-ROW, corpus-sized
  * state instead of catalog-sized).
  */
object EmbeddingOutlier {

  /** Quantization scale: µ-units. */
  val Scale = 1000000L

  /** Flagged per label. */
  val OutlierK = 5

  private[operators] val IntVecExpr =
    s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Scale.0) AS BIGINT))"

  private[operators] def fold(arr: String): String =
    s"aggregate($arr, CAST(0 AS BIGINT), (acc, x) -> acc + x)"

  def embeddingOutliers(embeddings: DataFrame, k: Int = OutlierK): DataFrame = {
    val e = embeddings
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("label"), expr(IntVecExpr).as("vi"))
    val cent = e
      .select(col("label"), posexplode(col("vi")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(sum("x").as("s"))
      .groupBy("label")
      .agg(expr("transform(sort_array(collect_list(struct(pos, s))), p -> p.s)").as("ci"))
    val w = Window.partitionBy("label").orderBy(col("cos_centroid").asc, col("vec_id"))
    e.join(cent, Seq("label"))
      .withColumn("dot", expr(fold("zip_with(vi, ci, (a, b) -> a * b)")))
      .withColumn("nv2", expr(fold("transform(vi, x -> x * x)")))
      .withColumn("nc2", expr(fold("transform(ci, x -> x * x)")))
      .withColumn("cos_centroid",
        expr("CAST(dot AS DOUBLE) / (sqrt(CAST(nv2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE)))"))
      .withColumn("rank", row_number().over(w))
      .withColumn("is_outlier", col("rank") <= k)
      .select(col("vec_id"), col("label"), r("cos_centroid", 6), col("rank"),
        col("is_outlier"))
  }

  def embeddingOutliersQ(embeddings: DataFrame): DataFrame =
    embeddingOutliers(embeddings).orderBy("label", "rank")

  val embeddingOutliersSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |         [CAST(round(CAST(x AS DOUBLE) * $Scale.0) AS BIGINT) for x in embedding] AS vi
       |  FROM embeddings
       |), comp AS (
       |  SELECT label, i AS pos, CAST(sum(vi[i]) AS BIGINT) AS s
       |  FROM e, unnest(range(1, len(vi) + 1)) AS t(i)
       |  GROUP BY 1, 2
       |), cent AS (
       |  SELECT label, list(s ORDER BY pos) AS ci FROM comp GROUP BY 1
       |), scored AS (
       |  SELECT vec_id, e.label,
       |         list_reduce([vi[i] * ci[i] for i in range(1, len(vi) + 1)], (a, b) -> a + b) AS dot,
       |         list_reduce([vi[i] * vi[i] for i in range(1, len(vi) + 1)], (a, b) -> a + b) AS nv2,
       |         list_reduce([ci[i] * ci[i] for i in range(1, len(ci) + 1)], (a, b) -> a + b) AS nc2
       |  FROM e JOIN cent ON e.label = cent.label
       |), cosd AS (
       |  SELECT vec_id, label,
       |         CAST(dot AS DOUBLE) / (sqrt(CAST(nv2 AS DOUBLE)) * sqrt(CAST(nc2 AS DOUBLE))) AS cos_centroid
       |  FROM scored
       |), ranked AS (
       |  SELECT vec_id, label, cos_centroid,
       |         CAST(row_number() OVER (PARTITION BY label ORDER BY cos_centroid ASC, vec_id) AS INT) AS rank
       |  FROM cosd
       |)
       |SELECT vec_id, label, ${rsql("cos_centroid", 6, "cos_centroid")}, rank,
       |       rank <= $OutlierK AS is_outlier
       |FROM ranked
       |ORDER BY label, rank""".stripMargin
}
