package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-QUOTA stratified sampling (round 8, continuation) — the
  * eval-set / calibration-set builder: "exactly 100 English docs, 70
  * French, 60 of everything else", deterministic across re-runs and
  * re-ingests. [[Sampling.corpusSample]] is the RATE form (keep ~50%,
  * realized count varies with corpus size); this is the COUNT form — an
  * exact per-stratum rank cut on the same content-keyed sample key, so
  * the selected set is stable under id reassignment and (unlike
  * `TABLESAMPLE`/`rand()`) reproducible by construction. Strata smaller
  * than their quota admit everything.
  *
  * Cross-engine exactness (§6): the rank is a row_number over the total
  * (sample_key ASC, doc_id ASC) key — the tie-break matters because
  * byte-identical duplicates SHARE a content key (by design, the
  * [[Sampling]] contract); admission is `rank ≤ quota`, pure integers.
  * NULL text keys on the empty fingerprint — total.
  *
  * Scale shape: one fused map pass for the key, then ONE lang-keyed
  * exchange for the rank window (spec-pinned). The per-stratum sort is
  * the [[Curation.qualitySelectWindow]] class — fine while a stratum
  * fits one reducer; at 100 TB the same two-pass histogram rank-count
  * rewrite applies (rank only the ≤quota-bounded head after a coarse
  * key-prefix cut), documented there. Quota tables are catalog-sized
  * constants compiled into the CASE — swapping in a real config changes
  * the constant, not the shape.
  */
object SampleQuota {

  /** Per-stratum target counts; unlisted strata take the default. */
  val Quotas: Map[String, Long] = Map("en" -> 100L, "fr" -> 70L)
  val DefaultQuota = 60L

  private def quotaCase: String =
    Quotas.toSeq.sorted.map { case (k, v) => s"WHEN '$k' THEN CAST($v AS BIGINT)" }
      .mkString("CASE lang ", " ", s" ELSE CAST($DefaultQuota AS BIGINT) END")

  def sampleQuota(documents: DataFrame): DataFrame = {
    val keyed = documents
      .withColumn("sample_key",
        expr("substring(md5(concat('graft-sample:', " +
          "md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' ')))))), 1, 8)"))
    keyed
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("sample_key"), col("doc_id"))))
      .withColumn("quota", expr(quotaCase))
      .withColumn("admitted", expr("CAST(rk AS BIGINT) <= quota"))
      .select(col("doc_id"), col("lang"), col("sample_key"),
        col("rk").cast("long").as("rk"), col("quota"), col("admitted"))
  }

  def sampleQuotaQ(documents: DataFrame): DataFrame =
    sampleQuota(documents).orderBy("doc_id")

  val sampleQuotaSql: String =
    s"""WITH k AS (
       |  SELECT doc_id, lang,
       |         substring(md5('graft-sample:' ||
       |           md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))))), 1, 8) AS sample_key
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, lang, sample_key,
       |         CAST(row_number() OVER (PARTITION BY lang
       |                                 ORDER BY sample_key, doc_id) AS BIGINT) AS rk,
       |         $quotaCase AS quota
       |  FROM k
       |)
       |SELECT doc_id, lang, sample_key, rk, quota, rk <= quota AS admitted
       |FROM r
       |ORDER BY doc_id""".stripMargin
}
