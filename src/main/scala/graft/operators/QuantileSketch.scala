package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAMPLED-QUANTILE SKETCH (round 9) — the quantile member of the
  * sketch family, completing the discipline [[ThetaDiff]] set for
  * distinct-set algebra: [[LengthQuantiles]] is the exact rank-select
  * contract (one per-source sort), and at 100 TB the sort's reducer
  * wants the same escape the distinct family got — a deterministic
  * uniform sample whose quantiles stand in for the population's, with
  * a measured rank-error bound.
  *
  * The sample is the [[ThetaDiff]] hash-θ construction on the doc's
  * content fingerprint: doc sampled iff `substring(fp, 1, 1) <
  * '$SampleHexBound'` — p = bound/16 exactly, engine-neutral, so both
  * engines draw the IDENTICAL sample and the estimates are sql-oracled
  * (an `approx_percentile`/t-digest can never be — engine-internal
  * centroids). Within the sample, quantile p is the exact
  * [[LengthQuantiles]] rank selection (`((m−1)·p) div 100`, (value,
  * doc_id) order) — integer end to end.
  *
  * Accuracy is a RANK guarantee, the right frame for quantiles (value
  * error is unbounded on heavy tails; rank error is distribution-free):
  * the true rank of the sampled p-quantile deviates from p·n by
  * O(√(n/p)) — QuantileSketchSpec measures the estimate's exact
  * population rank and pins it inside 3σ of the target for every
  * (source, percentile) at gate scale.
  *
  * Scale shape: the sampling predicate is map-side (kills 1−p before
  * the exchange), and the per-source sort runs over the SAMPLE — the
  * reducer ceiling shrinks by 1/p, and p narrows as the corpus grows
  * (the ThetaDiff dial). Samples are MERGEABLE by union (fixed θ), so
  * shards sketch independently.
  */
object QuantileSketch {

  /** fp-hex sampling bound: p = bound/16. Gate strata are tens of docs,
    * so the gate sample stays dense (p = 1/2); a 100 TB deployment
    * narrows p until the per-source sample fits one reducer
    * comfortably. */
  val SampleHexBound = 8
  val Quantiles: Seq[Int] = LengthQuantiles.Quantiles

  private val fpExpr =
    "md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"
  private val tokExpr =
    s"CAST(size(regexp_extract_all(coalesce(text, ''), '${TextOps.BpePattern.replace("\\", "\\\\")}', 0)) AS BIGINT)"

  def quantileSketch(documents: DataFrame): DataFrame = {
    val per = Window.partitionBy("source")
    val ord = Window.partitionBy("source").orderBy(col("n_tokens"), col("doc_id"))
    val ranked = documents
      .select(col("source"), col("doc_id"), expr(tokExpr).as("n_tokens"),
        expr(fpExpr).as("fp"))
      .filter(expr(s"substring(fp, 1, 1) < '$SampleHexBound'"))
      .withColumn("m", count(lit(1)).over(per))
      .withColumn("rn", row_number().over(ord))
    val qcols = Quantiles.map { p =>
      max(when(col("rn") === expr(s"((m - 1) * $p) div 100 + 1"),
        col("n_tokens"))).as(s"p$p")
    }
    ranked.groupBy("source")
      .agg(max(col("m")).as("n_sampled"), qcols: _*)
  }

  def quantileSketchQ(documents: DataFrame): DataFrame =
    quantileSketch(documents)
      .select(col("source") +: col("n_sampled") +:
        Quantiles.map(p => col(s"p$p")): _*)
      .orderBy("source")

  /** DuckDB twin: identical sample, identical rank selection. */
  val quantileSketchSql: String = {
    val sel = Quantiles.map { p =>
      s"CAST(max(CASE WHEN rn = ((m - 1) * $p) // 100 + 1 THEN n_tokens END) AS BIGINT) AS p$p"
    }.mkString(",\n       |       ")
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |         CAST(len(regexp_extract_all(COALESCE(text, ''), '${TextOps.BpePattern}')) AS BIGINT) AS n_tokens,
       |         md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g')))) AS fp
       |  FROM documents
       |), s AS (
       |  SELECT source, doc_id, n_tokens FROM t
       |  WHERE substring(fp, 1, 1) < '$SampleHexBound'
       |), ranked AS (
       |  SELECT source, n_tokens,
       |         count(*) OVER (PARTITION BY source) AS m,
       |         row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn
       |  FROM s
       |)
       |SELECT source, CAST(max(m) AS BIGINT) AS n_sampled,
       |       $sel
       |FROM ranked
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }
}
