package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NORMALIZATION FUNNEL (round 8, continuation) — how many distinct
  * documents survive each successive text normalization level: raw →
  * lowercased → whitespace-collapsed → alphanumeric-only. The dedup-dial
  * readout that tells an operator WHERE duplication hides (casing?
  * spacing? punctuation?) before choosing the fingerprint normalization
  * [[TextOps.docFingerprint]] commits to — each level's marginal distinct
  * drop is exactly the dup mass that normalization level would newly
  * merge.
  *
  * Cross-engine exactness (§6): md5-hex fingerprints per level (string
  * equality only), exact distinct counts, integer deltas. The alnum
  * level strips via the same Java∩RE2 class discipline as
  * [[PiiRedact]]'s patterns (`[^a-z0-9 ]` after lowering — no
  * locale-dependent character classes).
  *
  * Scale shape: ONE map pass computes all four level fingerprints, ONE
  * aggregation takes the four exact distinct counts (Spark plans the
  * multi-distinct expand — 4× the row stream, map-side combinable);
  * output is one row. At 100 TB the expand is the honest cost of four
  * exact cardinalities in one pass; the HLL sketch path
  * ([[CardinalityReport]]'s spec-measured twin) is the approximate dial.
  */
object NormalizationFunnel {

  def normalizationFunnel(documents: DataFrame): DataFrame = {
    documents
      .select(
        expr("md5(coalesce(text, ''))").as("fp_raw"),
        expr("md5(lower(coalesce(text, '')))").as("fp_lower"),
        expr("md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))").as("fp_ws"),
        expr("md5(trim(regexp_replace(regexp_replace(lower(coalesce(text, '')), '[^a-z0-9 ]', ''), '\\\\s+', ' ')))").as("fp_alnum"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("fp_raw").as("d_raw"),
        countDistinct("fp_lower").as("d_lower"),
        countDistinct("fp_ws").as("d_ws"),
        countDistinct("fp_alnum").as("d_alnum"))
      .withColumn("merged_by_lower", expr("d_raw - d_lower"))
      .withColumn("merged_by_ws", expr("d_lower - d_ws"))
      .withColumn("merged_by_alnum", expr("d_ws - d_alnum"))
      .select("n_docs", "d_raw", "d_lower", "d_ws", "d_alnum",
        "merged_by_lower", "merged_by_ws", "merged_by_alnum")
  }

  def normalizationFunnelQ(documents: DataFrame): DataFrame =
    normalizationFunnel(documents)

  val normalizationFunnelSql: String =
    s"""WITH f AS (
       |  SELECT md5(COALESCE(text, '')) AS fp_raw,
       |         md5(lower(COALESCE(text, ''))) AS fp_lower,
       |         md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g')))) AS fp_ws,
       |         md5(trim(regexp_replace(regexp_replace(lower(COALESCE(text, '')), '[^a-z0-9 ]', '', 'g'), '\\s+', ' ', 'g'))) AS fp_alnum
       |  FROM documents
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT fp_raw) AS BIGINT) AS d_raw,
       |       CAST(count(DISTINCT fp_lower) AS BIGINT) AS d_lower,
       |       CAST(count(DISTINCT fp_ws) AS BIGINT) AS d_ws,
       |       CAST(count(DISTINCT fp_alnum) AS BIGINT) AS d_alnum,
       |       CAST(count(DISTINCT fp_raw) - count(DISTINCT fp_lower) AS BIGINT) AS merged_by_lower,
       |       CAST(count(DISTINCT fp_lower) - count(DISTINCT fp_ws) AS BIGINT) AS merged_by_ws,
       |       CAST(count(DISTINCT fp_ws) - count(DISTINCT fp_alnum) AS BIGINT) AS merged_by_alnum
       |FROM f""".stripMargin
}
