package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Borda RANK-FUSION quality selection (round 8, continuation) — the
  * ensemble form of corpus gating: when several quality signals disagree
  * on scale (a per-mille stopword density, a diversity ratio, a length
  * score), averaging raw values lets one signal's variance dominate.
  * Rank fusion sidesteps calibration entirely: rank the corpus per
  * signal, sum the RANKS (Borda count), select on the fused rank.
  * [[Curation.qualitySelect]] cuts on ONE composite score;
  * [[FilterAgreement]] audits how two gates disagree; this is the third
  * member — combining disagreeing gates into one decision.
  *
  * Cross-engine exactness (§6): the three signals are integer per-mille /
  * deci-char values (`x · k div n`, nonnegative BIGINTs), each rank is a
  * row_number over the total (signal DESC, doc_id ASC) key, the Borda sum
  * is a 3-term integer add, and the keep gate compares
  * `final_rank · 100 ≤ n_lang · KeepPct` in integers. No float anywhere.
  * NULL text degrades to all-zero signals and ranks by doc_id — total.
  *
  * Scale shape: signals are one fused map pass (compile-time IN-list
  * stopwords, codegen'd — no join); all four rank windows and the count
  * window share ONE lang-keyed exchange (spec-pinned: per-stratum sorts,
  * the [[Curation.qualitySelectWindow]] class — the same stratum-skew
  * ceiling documented there applies, and the same two-pass rank-count
  * rewrite applies if a stratum outgrows one reducer).
  */
object QualityEnsemble {

  /** Keep the best KeepPct% of each language stratum by fused rank. */
  val KeepPct = 50L

  private val stopIn = TextOps.Stopwords.map(w => s"'$w'").mkString(", ")

  def qualityEnsemble(documents: DataFrame,
                      keepPct: Long = KeepPct): DataFrame = {
    val signals = documents
      .select(col("doc_id"), col("lang"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"),
        expr("length(regexp_replace(coalesce(text, ''), '\\\\s+', ''))").as("alpha_len"))
      .withColumn("n_tokens", expr("CAST(size(filter(w, t -> t <> '')) AS BIGINT)"))
      .withColumn("s_stop",
        expr(s"CAST(size(filter(w, t -> t IN ($stopIn))) AS BIGINT) * 1000 div greatest(n_tokens, 1)"))
      .withColumn("s_div",
        expr("CAST(size(array_distinct(filter(w, t -> t <> ''))) AS BIGINT) * 1000 div greatest(n_tokens, 1)"))
      .withColumn("s_len",
        expr("CAST(alpha_len AS BIGINT) * 10 div greatest(n_tokens, 1)"))
      .drop("w", "alpha_len")
    def rk(c: String) = row_number().over(
      Window.partitionBy("lang").orderBy(col(c).desc, col("doc_id")))
    val fused = signals
      .withColumn("r_stop", rk("s_stop"))
      .withColumn("r_div", rk("s_div"))
      .withColumn("r_len", rk("s_len"))
      .withColumn("n_lang", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("borda", expr("CAST(r_stop + r_div + r_len AS BIGINT)"))
    fused
      .withColumn("final_rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("borda"), col("doc_id"))))
      .withColumn("keep", expr(s"CAST(final_rank AS BIGINT) * 100 <= n_lang * $keepPct"))
      .select(col("doc_id"), col("lang"), col("s_stop"), col("s_div"),
        col("s_len"), col("borda"),
        col("final_rank").cast("long").as("final_rank"), col("keep"))
  }

  def qualityEnsembleQ(documents: DataFrame): DataFrame =
    qualityEnsemble(documents).orderBy("doc_id")

  val qualityEnsembleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w,
       |         length(regexp_replace(COALESCE(text, ''), '\\s+', '', 'g')) AS alpha_len
       |  FROM documents
       |), sig AS (
       |  SELECT doc_id, lang,
       |         CAST(len(list_filter(w, x -> x <> '')) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(w, x -> x IN ($stopIn))) AS BIGINT) * 1000
       |           // greatest(CAST(len(list_filter(w, x -> x <> '')) AS BIGINT), 1) AS s_stop,
       |         CAST(len(list_distinct(list_filter(w, x -> x <> ''))) AS BIGINT) * 1000
       |           // greatest(CAST(len(list_filter(w, x -> x <> '')) AS BIGINT), 1) AS s_div,
       |         CAST(alpha_len AS BIGINT) * 10
       |           // greatest(CAST(len(list_filter(w, x -> x <> '')) AS BIGINT), 1) AS s_len
       |  FROM t
       |), rk AS (
       |  SELECT doc_id, lang, s_stop, s_div, s_len,
       |         row_number() OVER (PARTITION BY lang ORDER BY s_stop DESC, doc_id) AS r_stop,
       |         row_number() OVER (PARTITION BY lang ORDER BY s_div DESC, doc_id) AS r_div,
       |         row_number() OVER (PARTITION BY lang ORDER BY s_len DESC, doc_id) AS r_len,
       |         count(*) OVER (PARTITION BY lang) AS n_lang
       |  FROM sig
       |), fused AS (
       |  SELECT doc_id, lang, s_stop, s_div, s_len, n_lang,
       |         CAST(r_stop + r_div + r_len AS BIGINT) AS borda
       |  FROM rk
       |)
       |SELECT doc_id, lang, s_stop, s_div, s_len, borda,
       |       CAST(row_number() OVER (PARTITION BY lang ORDER BY borda, doc_id) AS BIGINT) AS final_rank,
       |       CAST(row_number() OVER (PARTITION BY lang ORDER BY borda, doc_id) AS BIGINT) * 100
       |         <= n_lang * $KeepPct AS keep
       |FROM fused
       |ORDER BY doc_id""".stripMargin
}
