package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Embedding-space DRIFT monitor (round 8, continuation) — per label,
  * the cosine between the label's centroid in two corpus cohorts (the
  * deterministic vec_id-parity split standing in for "before/after the
  * embedding model swap", the [[CorpusDiff]] synthetic-version
  * convention): cos ≈ 1 means the label's region is stable, a low
  * cosine names WHERE the space moved. The monitoring twin of
  * [[KnnPurity]] (is the space good) — this is "did it CHANGE", the
  * gate a re-embedding rollout is judged by before ANN indexes are
  * rebuilt against it.
  *
  * Cross-engine exactness (§6): [[EmbeddingOutlier]]'s integer-centroid
  * discipline — components quantized to µ-units, centroids are exact
  * BIGINT sums (order-free on any partitioning), cosine is one
  * double division of integer folds. Labels present in only one cohort
  * report with n=0 on the other side and NULL cosine (full-outer — a
  * vanished label IS drift).
  *
  * Scale shape: one posexplode partial-agg per cohort (map-side
  * combinable, 64·|labels| rows each), centroid arrays rebuilt with the
  * deterministic sort_array(collect_list(struct)) fold, one
  * catalog-sized full-outer join, and a fused map for the integer
  * folds. Nothing after the component sums is corpus-sized.
  */
object EmbeddingDrift {

  private def centroids(e: DataFrame, prefix: String): DataFrame =
    e.select(col("label"), posexplode(col("vi")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(sum("x").as("s"), count(lit(1)).as("cnt"))
      .groupBy("label")
      .agg(expr("transform(sort_array(collect_list(struct(pos, s))), p -> p.s)")
        .as(s"${prefix}_ci"),
        (max("cnt")).as(s"${prefix}_n"))

  def embeddingDrift(embeddings: DataFrame): DataFrame = {
    val e = embeddings
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("label"),
        expr(EmbeddingOutlier.IntVecExpr).as("vi"))
    val old = centroids(e.filter(col("vec_id") % 2 === 0), "old")
    val nw = centroids(e.filter(col("vec_id") % 2 === 1), "new")
    old.join(nw, Seq("label"), "full_outer")
      .withColumn("dot",
        expr(EmbeddingOutlier.fold("zip_with(old_ci, new_ci, (a, b) -> a * b)")))
      .withColumn("no2", expr(EmbeddingOutlier.fold("transform(old_ci, x -> x * x)")))
      .withColumn("nn2", expr(EmbeddingOutlier.fold("transform(new_ci, x -> x * x)")))
      .withColumn("cos_shift",
        expr("""CASE WHEN old_ci IS NULL OR new_ci IS NULL OR no2 = 0 OR nn2 = 0 THEN NULL
               |     ELSE CAST(dot AS DOUBLE) /
               |          (sqrt(CAST(no2 AS DOUBLE)) * sqrt(CAST(nn2 AS DOUBLE)))
               |END""".stripMargin))
      .select(col("label"),
        coalesce(col("old_n"), lit(0L)).as("n_old"),
        coalesce(col("new_n"), lit(0L)).as("n_new"),
        r("cos_shift", 6))
  }

  def embeddingDriftQ(embeddings: DataFrame): DataFrame =
    embeddingDrift(embeddings).orderBy("label")

  val embeddingDriftSql: String = {
    def cohort(name: String, parity: Int): String =
      s"""${name}_comp AS (
         |  SELECT label, i AS pos, CAST(sum(vi[i]) AS BIGINT) AS s,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM e, unnest(range(1, len(vi) + 1)) AS t(i)
         |  WHERE vec_id % 2 = $parity
         |  GROUP BY 1, 2
         |), ${name}c AS (
         |  SELECT label, list(s ORDER BY pos) AS ${name}_ci,
         |         CAST(max(cnt) AS BIGINT) AS ${name}_n
         |  FROM ${name}_comp GROUP BY 1
         |)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |         [CAST(round(CAST(x AS DOUBLE) * ${EmbeddingOutlier.Scale}.0) AS BIGINT) for x in embedding] AS vi
       |  FROM embeddings
       |), ${cohort("old", 0)}, ${cohort("new", 1)}, j AS (
       |  SELECT COALESCE(oldc.label, newc.label) AS label,
       |         old_ci, new_ci,
       |         COALESCE(old_n, 0) AS n_old, COALESCE(new_n, 0) AS n_new
       |  FROM oldc FULL JOIN newc ON oldc.label = newc.label
       |), norms AS (
       |  SELECT label, n_old, n_new, old_ci, new_ci,
       |         CASE WHEN old_ci IS NULL THEN NULL
       |              ELSE list_reduce([old_ci[i] * old_ci[i] for i in range(1, len(old_ci) + 1)], (a, b) -> a + b) END AS no2,
       |         CASE WHEN new_ci IS NULL THEN NULL
       |              ELSE list_reduce([new_ci[i] * new_ci[i] for i in range(1, len(new_ci) + 1)], (a, b) -> a + b) END AS nn2
       |  FROM j
       |), folded AS (
       |  SELECT label, n_old, n_new,
       |         CASE WHEN old_ci IS NULL OR new_ci IS NULL OR no2 = 0 OR nn2 = 0 THEN NULL
       |              ELSE CAST(list_reduce([old_ci[i] * new_ci[i] for i in range(1, len(old_ci) + 1)], (a, b) -> a + b) AS DOUBLE) /
       |                   (sqrt(CAST(no2 AS DOUBLE)) * sqrt(CAST(nn2 AS DOUBLE)))
       |         END AS cos_shift
       |  FROM norms
       |)
       |SELECT label, n_old, n_new, ${rsql("cos_shift", 6, "cos_shift")}
       |FROM folded
       |ORDER BY label""".stripMargin
  }
}
