package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filter AGREEMENT audit (round 8, continuation) — the number a curation
  * team reads before COMPOSING gates: the contingency between the
  * heuristic quality gate ([[TextOps.textQuality]]'s keep, the
  * corpus_filter admission term) and the model-based low-likelihood tail
  * ([[LmScore]] bottom quartile). The off-diagonal cells are the
  * decision: (keep=true, low_lm=true) is what ADDING the LM filter would
  * newly remove; (keep=false, low_lm=false) is what it would rescue if it
  * REPLACED the heuristic. Token mass per cell prices the change.
  *
  * Engine-stable threshold: the LM score rides as the INTEGER floor
  * average `ppm_int = sum_w div greatest(n, 1)`, bucketed `div 100` to a
  * ≤10⁴-value domain, and the quartile cut is RANK SELECTION over the
  * bucket histogram ([[LengthQuantiles]]' type-1 convention: smallest
  * bucket whose cumulative count reaches zero-based index
  * `((n−1)·25) div 100` + 1) — integer end to end, no percentile
  * interpolation, no float compare. The only floats anywhere are inside
  * the quality score, whose ≥ 0.5 gate is the already-shipped
  * corpus_filter term. `greatest(n, 1)` in the index guard matters
  * doubly: Spark `div` truncates toward zero while DuckDB `//` floors,
  * so NEGATIVE operands are the one place the two integer divisions
  * disagree — every div in this file is provably non-negative.
  *
  * Scale shape: the per-doc frame (LM sums ⋈ quality flags ⋈ token
  * counts, doc-keyed joins) is localCheckpoint'd — TWO consumers (the
  * histogram aggregation and the final contingency; the upstream LM
  * scoring is the expensive part, exactly the case the multi-consumer
  * invariant exists for). The histogram is ≤10⁴ rows by bucketing
  * construction (its single-partition cumulative window is bounded the
  * same way quality_select's per-stratum histogram window is); the
  * threshold and total ride as 1-row broadcast facts; output is ≤ 4
  * rows + the threshold column.
  */
object FilterAgreement {

  /** Bottom per-cent cut for the LM tail (quartile). */
  val LowPct = 25

  /** ppm bucket width (10⁶ ppm domain / 100 → ≤10⁴ buckets). */
  val BucketWidth = 100L

  def filterAgreement(documents: DataFrame): DataFrame = {
    val lm = LmScore.lmScore(documents)
      .select(col("doc_id"),
        expr(s"(sum_w div greatest(n_bigrams, 1)) div $BucketWidth").as("b"))
    val q = TextOps.textQuality(documents)
      .select(col("doc_id"), col("keep").as("keep_quality"),
        col("n_tokens").cast("long").as("n_tokens"))
    val base = q.join(lm, Seq("doc_id")).localCheckpoint()
    val tot = base.agg(count(lit(1)).as("n_total"))
    val hist = base.groupBy("b").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val threshold = hist.crossJoin(tot)
      .filter(expr(s"cum >= ((greatest(n_total, 1) - 1) * $LowPct) div 100 + 1"))
      .agg(min("b").as("tb"))
    base.crossJoin(threshold)
      .withColumn("low_lm", col("b") <= col("tb"))
      .groupBy("keep_quality", "low_lm")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        max("tb").as("lm_p25_bucket"))
  }

  def filterAgreementQ(documents: DataFrame): DataFrame =
    filterAgreement(documents)
      .select(col("keep_quality"), col("low_lm"), col("n_docs"),
        col("sum_tokens"), col("lm_p25_bucket"))
      .orderBy("keep_quality", "low_lm")

  /** Oracle nests the LM agg chain and the quality-score chain verbatim
    * (one text with their own oracles). */
  val filterAgreementSql: String =
    s"""WITH ${LmScore.lmAggCtes("TRUE", "TRUE")},
       |${TextOps.qualityScoreCtes(Seq("text"))},
       |perdoc AS (
       |  SELECT q3.doc_id,
       |         q3.quality_score >= 0.5 AS keep_quality,
       |         CAST(len(string_split_regex(lower(trim(q3.text)), '\\s+')) AS BIGINT) AS n_tokens,
       |         (COALESCE(a.sum_w, 0) // greatest(COALESCE(a.n_bigrams, 0), 1)) // $BucketWidth AS b
       |  FROM q3 LEFT JOIN agg a ON a.doc_id = q3.doc_id
       |), tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_total FROM perdoc
       |), hist AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS cnt,
       |         CAST(sum(count(*)) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM perdoc GROUP BY b
       |), thr AS (
       |  SELECT min(b) AS tb FROM hist CROSS JOIN tot
       |  WHERE cum >= ((greatest(n_total, 1) - 1) * $LowPct) // 100 + 1
       |)
       |SELECT p.keep_quality, p.b <= t.tb AS low_lm,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(p.n_tokens) AS BIGINT) AS sum_tokens,
       |       max(t.tb) AS lm_p25_bucket
       |FROM perdoc p CROSS JOIN thr t
       |GROUP BY 1, 2
       |ORDER BY keep_quality, low_lm""".stripMargin
}
