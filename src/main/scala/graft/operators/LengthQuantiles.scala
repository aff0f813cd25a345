package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source token-length QUANTILES (round 8, continuation) — the
  * distribution-tail numbers [[TokenHistogram]]'s power-of-two buckets
  * deliberately blur: p25/p50/p75/p95 of the BPE-ish token count per
  * source, read when choosing context length and truncation policy ("p95
  * of this source is 1.9k tokens — a 2k window loses 5% of its docs to
  * truncation").
  *
  * The §6 move for an exact cross-engine QUANTILE over integers:
  * RANK SELECTION, not interpolation. `percentile`/`quantile_cont`
  * interpolate at fractional index `p·(n−1)` — a float product whose
  * last-ulp behavior is engine-private. Here quantile p is the element
  * at zero-based index `((n−1)·p) div 100` in (n_tokens, doc_id) order —
  * integer arithmetic end to end, deterministic tie-break, the same
  * value both engines pick BY CONSTRUCTION (the discrete
  * lower-quantile / type-1 convention). Token counts are integers, so
  * no value ever needs interpolating — the selection convention IS the
  * right semantics, not an approximation.
  *
  * Scale shape: ONE hash exchange on source — the count window, the
  * row_number sort, and the closing conditional-max aggregation all
  * share the partitioning (the [[Funnel]] stacking pattern; spec-pinned
  * 1 exchange). Like [[Curation.qualitySelectWindow]], the per-source
  * sort makes a dominant source one reducer at 100 TB; the documented
  * scale path is the same two-pass (source, n_tokens)-histogram rank
  * count that quality_select ships (counts-above + tie-bucket
  * row_number — identical algebra, histogram-sized frames), which this
  * operator's rank-selection semantics was chosen to compose with.
  */
object LengthQuantiles {

  /** Reported percentiles (per-cent integers). */
  val Quantiles: Seq[Int] = Seq(25, 50, 75, 95)

  private val tokExpr: String =
    s"CAST(size(regexp_extract_all(coalesce(text, ''), '${TextOps.BpePattern.replace("\\", "\\\\")}', 0)) AS BIGINT)"

  def lengthQuantiles(documents: DataFrame): DataFrame = {
    val per = Window.partitionBy("source")
    val ord = Window.partitionBy("source").orderBy(col("n_tokens"), col("doc_id"))
    val ranked = documents
      .select(col("source"), col("doc_id"), expr(tokExpr).as("n_tokens"))
      .withColumn("n_docs", count(lit(1)).over(per))
      .withColumn("rn", row_number().over(ord))
    val qcols = Quantiles.map { p =>
      max(when(col("rn") === expr(s"((n_docs - 1) * $p) div 100 + 1"),
        col("n_tokens"))).as(s"p$p")
    }
    ranked.groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"), qcols: _*)
  }

  def lengthQuantilesQ(documents: DataFrame): DataFrame =
    lengthQuantiles(documents)
      .select(col("source") +: col("n_docs") +:
        Quantiles.map(p => col(s"p$p")): _*)
      .orderBy("source")

  /** DuckDB twin: identical rank selection (`//` = `div`). */
  val lengthQuantilesSql: String = {
    val sel = Quantiles.map { p =>
      s"CAST(max(CASE WHEN rn = ((n_docs - 1) * $p) // 100 + 1 THEN n_tokens END) AS BIGINT) AS p$p"
    }.mkString(",\n       |       ")
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |         CAST(len(regexp_extract_all(COALESCE(text, ''), '${TextOps.BpePattern}')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), ranked AS (
       |  SELECT source, n_tokens,
       |         count(*) OVER (PARTITION BY source) AS n_docs,
       |         row_number() OVER (PARTITION BY source ORDER BY n_tokens, doc_id) AS rn
       |  FROM t
       |)
       |SELECT source, CAST(max(n_docs) AS BIGINT) AS n_docs,
       |       $sel
       |FROM ranked
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }
}
