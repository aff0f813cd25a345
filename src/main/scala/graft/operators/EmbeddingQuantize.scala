package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EMBEDDING INT8-QUANTIZATION audit (round 8, continuation 5) — the
  * post-training-quantization error report an ANN index reads before
  * switching its vector storage to int8 (4× memory, SIMD distance):
  * per label, the worst and mean absolute reconstruction error under
  * symmetric per-vector int8 quantization (code = round(x·127/s),
  * s = the vector's max |component|). [[EmbeddingProfile]] says the
  * vectors ARRIVED sane; this says what compressing them would COST —
  * per label, because PTQ error concentrates where the space is
  * anisotropic and a global average hides exactly that.
  *
  * Cross-engine exactness (SURVEY §6): components in µ-units, and the
  * whole quantize→dequantize→error chain is SIGN-FREE integer
  * arithmetic — for magnitude a = |x|: code m = `(a·254 + s) div
  * (2s)` (round-half-up, m ≤ 127 by construction), dequant d =
  * `(m·2s + 127) div 254`, err = `|a − d|` — the reconstruction is
  * odd-symmetric so |x − sign·d| = |a − d| and no engine sign/rounding
  * divergence can enter (the [[Lexicon]] negative-division lesson,
  * designed out instead of factored out). Scale s ≥ 1 (zero vectors
  * quantize to themselves, error 0).
  *
  * Scale shape: pure map pass (per-row transform + bounded folds) into
  * one |labels|-sized combinable agg — [[EmbeddingProfile]]'s plan
  * class (zero joins/windows, spec-pinned). Error sums stay µ-unit
  * BIGINTs: err ≤ s/254 + 1 ≤ ~9k µ per component, ~5·10¹⁵ even at
  * 10⁹ × dim-64 — no second quantization needed.
  */
object EmbeddingQuantize {

  /** Per-component error lambda body over magnitude; `divOp` is the
    * engine's integer division ([[ZOrder.mortonExpr]] convention). */
  private def errExpr(x: String, divOp: String): String = {
    val a = s"abs($x)"
    val m = s"(($a * 254 + s) $divOp (2 * s))"
    val d = s"(($m * 2 * s + 127) $divOp 254)"
    s"abs($a - $d)"
  }

  def embeddingQuantizeAudit(embeddings: DataFrame): DataFrame = {
    val q = embeddings
      .repartition(col("vec_id"))
      .withColumn("qu",
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"))
      .withColumn("s",
        expr("greatest(array_max(qu), -array_min(qu), CAST(1 AS BIGINT))"))
      .withColumn("errs", expr(s"transform(qu, x -> ${errExpr("x", "div")})"))
      .withColumn("row_max", expr("aggregate(errs, CAST(0 AS BIGINT), (a, e) -> greatest(a, e))"))
      .withColumn("row_sum", expr("aggregate(errs, CAST(0 AS BIGINT), (a, e) -> a + e)"))
      .withColumn("dim", expr("CAST(size(embedding) AS BIGINT)"))
    q.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        max("row_max").as("max_err_u"),
        sum("row_sum").as("sum_err_u"),
        sum("dim").as("n_comps"),
        max("s").as("max_scale_u"))
      .select(col("label"), col("n_vecs"), col("max_err_u"),
        expr("sum_err_u div greatest(n_comps, 1)").as("mean_err_u"),
        col("max_scale_u"))
  }

  def embeddingQuantizeAuditQ(embeddings: DataFrame): DataFrame =
    embeddingQuantizeAudit(embeddings).orderBy("label")

  val embeddingQuantizeAuditSql: String = {
    val err = errExpr("qu[i]", "//")
    s"""WITH q AS (
       |  SELECT label, len(embedding) AS dim,
       |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS qu
       |  FROM embeddings
       |), sc AS (
       |  SELECT label, dim, qu,
       |         greatest(list_max(qu), -list_min(qu), 1) AS s
       |  FROM q
       |), e AS (
       |  SELECT label, dim,
       |         [$err for i in range(1, len(qu) + 1)] AS errs,
       |         s
       |  FROM sc
       |), f AS (
       |  SELECT label, CAST(dim AS BIGINT) AS dim, s,
       |         CAST(coalesce(list_max(errs), 0) AS BIGINT) AS row_max,
       |         CAST(coalesce(list_sum(errs), 0) AS BIGINT) AS row_sum
       |  FROM e
       |)
       |SELECT label,
       |       CAST(count(*) AS BIGINT) AS n_vecs,
       |       max(row_max) AS max_err_u,
       |       CAST(sum(row_sum) AS BIGINT) // greatest(CAST(sum(dim) AS BIGINT), 1) AS mean_err_u,
       |       max(s) AS max_scale_u
       |FROM f
       |GROUP BY 1
       |ORDER BY label""".stripMargin
  }
}
