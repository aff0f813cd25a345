package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic stratified DOWNSAMPLING (round 8) — the mixture
  * reweighting stage between curation and packing: "keep 50% of English,
  * 80% of French, all of everything else" compiled to a pure map pass.
  * The sample decision is CONTENT-KEYED, like [[TextOps.corpusSplit]]:
  * the key is a salted md5 over the dedup FINGERPRINT, so byte-identical
  * docs sample identically across re-ingests and id reassignments, and
  * the same doc can never be in for one replica and out for another.
  *
  * Cross-engine exactness (§6): the rate is applied as a LEXICOGRAPHIC
  * compare of the key's first 8 hex chars against a precomputed hex
  * threshold — `floor(rate·2³²)` rendered as 8 lowercase hex digits, or
  * `'g'` (> every hex digit) for rate ≥ 1 — no float comparison, no
  * integer conversion of the hash on either engine; both CASE branches
  * are generated from ONE Scala map so the Spark expression and the
  * DuckDB oracle cannot drift. Strata with no configured rate take
  * rate 1.0. NULL-text docs key on the empty fingerprint (coalesce) —
  * deterministic, never a NULL verdict.
  *
  * Scale shape: fused map pass — one regexp_replace + two md5 per row,
  * zero exchanges before the output sort. The realized rate converges on
  * the configured rate at corpus scale (md5 uniformity); at gate scale
  * the spec checks exact per-doc recomputation, not the asymptotic rate.
  */
object Sampling {

  /** Stratification column and per-stratum keep rates: downsample the
    * dominant language, keep the rest (the canonical mixture-rebalance
    * move); unlisted strata keep everything. */
  val SampleRates: Map[String, Double] = Map("en" -> 0.5, "fr" -> 0.8)
  val DefaultRate = 1.0

  /** 8-lowercase-hex threshold for `key8 < thr` ⇔ "keep with prob rate". */
  private[graft] def thresholdHex(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(math.floor(rate * 4294967296.0), 0).toLong}%08x"

  /** Identical CASE text on both engines (sorted keys); CAST AS DOUBLE
    * because a bare decimal literal types as DECIMAL on both engines
    * (§6's no-bare-decimal-literals rule). */
  private def rateCase: String =
    SampleRates.toSeq.sorted.map { case (k, v) => s"WHEN '$k' THEN CAST($v AS DOUBLE)" }
      .mkString("CASE lang ", " ", s" ELSE CAST($DefaultRate AS DOUBLE) END")
  private def thrCase: String =
    SampleRates.toSeq.sorted.map { case (k, v) => s"WHEN '$k' THEN '${thresholdHex(v)}'" }
      .mkString("CASE lang ", " ", s" ELSE '${thresholdHex(DefaultRate)}' END")

  def corpusSample(documents: DataFrame): DataFrame =
    documents
      .withColumn("fingerprint",
        expr("md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"))
      .withColumn("sample_key",
        expr("substring(md5(concat('graft-sample:', fingerprint)), 1, 8)"))
      .withColumn("rate", expr(rateCase))
      .withColumn("sampled", expr(s"sample_key < $thrCase"))
      .select(col("doc_id"), col("lang"), col("source"), col("sample_key"),
        col("rate"), col("sampled"))

  def corpusSampleQ(documents: DataFrame): DataFrame =
    corpusSample(documents).orderBy("doc_id")

  val corpusSampleSql: String =
    s"""WITH k AS (
       |  SELECT doc_id, lang, source,
       |         substring(md5('graft-sample:' ||
       |           md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))))), 1, 8) AS sample_key
       |  FROM documents
       |)
       |SELECT doc_id, lang, source, sample_key,
       |       $rateCase AS rate,
       |       sample_key < $thrCase AS sampled
       |FROM k
       |ORDER BY doc_id""".stripMargin
}
