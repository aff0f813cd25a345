package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PARETO FRONT / skyline (round 10) — per source, the documents not
  * DOMINATED in the (quality, length) plane: doc j dominates doc i iff
  * `q_j ≥ q_i AND t_j ≥ t_i AND (q_j > q_i OR t_j > t_i)`. The curation
  * reading: the docs where you cannot get a longer document without
  * giving up quality (or vice versa) — the frontier `quality_select`'s
  * single-axis cut can't see, and the standard multi-criteria selection
  * primitive (Börzsönyi et al., "The Skyline Operator", ICDE 2001 —
  * public literature).
  *
  * Dimensions: `qs4` (the [[TextOps.textQuality]] composite score
  * quantized to integer 1e-4 — the quality_select discipline, so both
  * engines agree bit-for-bit) and `n_tokens`. NULL-scored docs (NULL
  * text) are excluded on both sides — dominance is undefined off the
  * plane.
  *
  * Plan shape — the point at scale: the definitional form is a
  * QUADRATIC per-source self-join (the oracle keeps it: DuckDB NOT
  * EXISTS dominance — agreement proves the window algebra below), but a
  * 2-D skyline needs only ONE sorted pass: order each source by qs4
  * DESC, then a doc is dominated iff a strictly-higher-quality doc has
  * n_tokens ≥ its own (running `max(n_tokens)` over the RANGE frame
  * ending 1 PRECEDING) or a same-quality doc has n_tokens strictly
  * greater (the RANGE CURRENT ROW peer frame). Both windows share the
  * (source, qs4 DESC) partitioning+sort — exactly one exchange and one
  * sort, no self-join anywhere (spec-pinned). At 100 TB this is a
  * per-source sort, the same reducer geometry as length_quantiles,
  * with the same sketch-family escape available if a source outgrows
  * its reducer.
  */
object ParetoFront {

  /** The one-pass window skyline over (source, doc_id, qs4, n_tokens)
    * points — exposed for the planted-point spec. */
  private[graft] def skyline(pts: DataFrame): DataFrame = {
    val byQ = Window.partitionBy("source").orderBy(col("qs4").desc)
    val higher = byQ.rangeBetween(Window.unboundedPreceding, -1)
    val peers = byQ.rangeBetween(Window.currentRow, Window.currentRow)
    pts
      .withColumn("max_t_higher", max(col("n_tokens")).over(higher))
      .withColumn("max_t_peer", max(col("n_tokens")).over(peers))
      // dominated by a strictly-higher-q doc with t >= mine (NULL frame =
      // no higher q), or by a same-q peer with t strictly > mine
      // (max_t_peer includes self, so > mine means a strict dominator)
      .filter(coalesce(col("max_t_higher"), lit(Long.MinValue)) < col("n_tokens") &&
        col("max_t_peer") <= col("n_tokens"))
      .select("source", "doc_id", "qs4", "n_tokens")
  }

  def paretoFront(documents: DataFrame): DataFrame =
    skyline(TextOps.textQuality(documents)
      .withColumn("qs4", expr("CAST(round(quality_score * 10000.0) AS BIGINT)"))
      .select(col("source"), col("doc_id"), col("qs4"),
        col("n_tokens").cast("long").as("n_tokens"))
      .filter(col("qs4").isNotNull && col("n_tokens").isNotNull))

  def paretoFrontQ(documents: DataFrame): DataFrame =
    paretoFront(documents).orderBy(col("source"), col("qs4").desc, col("doc_id"))

  /** DuckDB twin — deliberately the DEFINITIONAL quadratic NOT EXISTS,
    * not the window algebra: agreement proves the one-pass form. */
  val paretoFrontSql: String =
    s"""WITH ${TextOps.qualityScoreCtes(Seq("source", "text"))}, scored AS (
       |  SELECT source, doc_id,
       |         CAST(round(quality_score * 10000.0) AS BIGINT) AS qs4,
       |         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM q3
       |), pts AS (
       |  SELECT * FROM scored WHERE qs4 IS NOT NULL AND n_tokens IS NOT NULL
       |)
       |SELECT source, doc_id, qs4, n_tokens
       |FROM pts a
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM pts b
       |  WHERE b.source = a.source
       |    AND b.qs4 >= a.qs4 AND b.n_tokens >= a.n_tokens
       |    AND (b.qs4 > a.qs4 OR b.n_tokens > a.n_tokens)
       |)
       |ORDER BY source, qs4 DESC, doc_id""".stripMargin
}
