package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture COMPILATION (round 8) — the step between "we want this data
  * mixture" and the shuffle/pack stages: given per-stratum target weights
  * and a global token budget, emit the deterministic per-document
  * replication plan. [[Sampling.corpusSample]] applies a GIVEN keep-rate;
  * this derives the rates FROM the data (per-stratum token inventories vs
  * the target mixture) and handles the UPSAMPLING side: a stratum whose
  * target exceeds its inventory repeats whole epochs (`epochs_full`) plus
  * a deterministic partial pass, which is the standard way under-resourced
  * languages are up-weighted in pretraining mixtures.
  *
  * Arithmetic contract: ALL-INTEGER (§6) — per-mille weights, integer
  * `div`/`%`, running sums over BIGINT token counts; the only per-doc
  * decision is an integer compare against the stratum's remainder budget,
  * so both engines agree bit-for-bit with no float anywhere. The partial
  * pass is the same maximal-prefix rule as [[Curation.tokenBudgetPack]]:
  * docs in hash order (`mix_key`, doc_id) admit while the running sum fits
  * the remainder `target % inventory`.
  *
  * Scale shape: one map pass (tokens + key) → per-stratum agg (|langs|
  * rows) → global roll of that tiny frame → broadcast plan join back →
  * one per-stratum prefix-sum window. The plan frame is bounded by the
  * number of strata, so the broadcast is safe at any corpus size. The
  * tokenizing map pass runs twice (stats pass + final pass) BY DESIGN —
  * the [[Curation.qualitySelect]] argument: materializing a 100 TB corpus
  * to save one regexp pass is the wrong trade. The per-stratum window is
  * the gate-scale plan; a giant stratum takes
  * [[Curation.tokenBudgetPackRange]]'s range-partitioned offset algebra
  * unchanged (the cum key here is identical in shape).
  */
object MixturePlan {

  /** Target mixture in per-mille (integers so target math is exact);
    * strata absent from the map get weight 0 — planned to zero copies. */
  val TargetPerMille: Map[String, Long] = Map(
    "en" -> 400L, "zh" -> 200L, "de" -> 150L, "es" -> 150L, "fr" -> 100L)

  /** Global budget as a fraction of the corpus token inventory:
    * budget = total · Num / Den (integer div — deterministic). 3/4 keeps
    * every stratum's plan non-trivial at gate scale: en (~46% of tokens,
    * target 40% of 75%) downsamples to a partial pass, zh (~9%, target
    * 20% of 75%) upsamples past one full epoch. */
  val BudgetNum = 3L
  val BudgetDen = 4L

  private val BpeExpr = {
    val bpe = TextOps.BpePattern.replace("\\", "\\\\")
    s"CAST(size(regexp_extract_all(coalesce(text, ''), '$bpe', 0)) AS BIGINT)"
  }

  def mixturePlan(documents: DataFrame): DataFrame = {
    val toks = documents.select(
      col("doc_id"), col("lang"),
      expr(BpeExpr).as("bpe_tokens"),
      expr("md5(concat('graft-mix:', CAST(doc_id AS STRING)))").as("mix_key"))
    val weightCase = TargetPerMille.toSeq.sorted
      .map { case (l, w) => s"WHEN '$l' THEN ${w}L" }
      .mkString("CASE lang ", " ", " ELSE 0L END")
    // |langs|-row plan frame: inventory, target, epochs, remainder
    val stats = toks.groupBy("lang")
      .agg(sum("bpe_tokens").as("lang_tokens"))
    val plan = stats
      .crossJoin(broadcast(stats.agg(sum("lang_tokens").as("total_tokens"))))
      .withColumn("budget", expr(s"total_tokens * $BudgetNum div $BudgetDen"))
      .withColumn("target_tokens", expr(s"budget * ($weightCase) div 1000"))
      .withColumn("epochs_full",
        expr("CASE WHEN lang_tokens = 0 THEN 0L ELSE target_tokens div lang_tokens END"))
      .withColumn("partial_budget",
        expr("CASE WHEN lang_tokens = 0 THEN 0L ELSE target_tokens % lang_tokens END"))
      .select("lang", "lang_tokens", "target_tokens", "epochs_full", "partial_budget")
    val w = Window.partitionBy("lang").orderBy("mix_key", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(plan), Seq("lang"))
      .withColumn("cum_tokens", sum("bpe_tokens").over(w))
      .withColumn("in_partial", col("cum_tokens") <= col("partial_budget"))
      .withColumn("copies",
        expr("epochs_full + CASE WHEN cum_tokens <= partial_budget THEN 1L ELSE 0L END"))
      .select(col("doc_id"), col("lang"), col("bpe_tokens"), col("mix_key"),
        col("lang_tokens"), col("target_tokens"), col("epochs_full"),
        col("cum_tokens"), col("in_partial"), col("copies"))
  }

  def mixturePlanQ(documents: DataFrame): DataFrame =
    mixturePlan(documents).orderBy("doc_id")

  val mixturePlanSql: String = {
    val weightCase = TargetPerMille.toSeq.sorted
      .map { case (l, w) => s"WHEN '$l' THEN $w" }
      .mkString("CASE lang ", " ", " ELSE 0 END")
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |         CAST(len(regexp_extract_all(COALESCE(text, ''), '${TextOps.BpePattern}')) AS BIGINT) AS bpe_tokens,
       |         md5('graft-mix:' || CAST(doc_id AS VARCHAR)) AS mix_key
       |  FROM documents
       |), stats AS (
       |  SELECT lang, CAST(sum(bpe_tokens) AS BIGINT) AS lang_tokens
       |  FROM toks GROUP BY lang
       |), tot AS (
       |  SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens FROM stats
       |), plan AS (
       |  SELECT lang, lang_tokens,
       |         (total_tokens * $BudgetNum // $BudgetDen) * ($weightCase) // 1000 AS target_tokens,
       |         CASE WHEN lang_tokens = 0 THEN 0
       |              ELSE ((total_tokens * $BudgetNum // $BudgetDen) * ($weightCase) // 1000) // lang_tokens END AS epochs_full,
       |         CASE WHEN lang_tokens = 0 THEN 0
       |              ELSE ((total_tokens * $BudgetNum // $BudgetDen) * ($weightCase) // 1000) % lang_tokens END AS partial_budget
       |  FROM stats, tot
       |), cum AS (
       |  SELECT t.doc_id, t.lang, t.bpe_tokens, t.mix_key,
       |         p.lang_tokens, p.target_tokens, p.epochs_full, p.partial_budget,
       |         sum(t.bpe_tokens) OVER (PARTITION BY t.lang
       |           ORDER BY t.mix_key, t.doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
       |  FROM toks t JOIN plan p ON p.lang = t.lang
       |)
       |SELECT doc_id, lang, bpe_tokens, mix_key, lang_tokens, target_tokens,
       |       epochs_full, CAST(cum_tokens AS BIGINT) AS cum_tokens,
       |       cum_tokens <= partial_budget AS in_partial,
       |       CAST(epochs_full + CASE WHEN cum_tokens <= partial_budget THEN 1 ELSE 0 END AS BIGINT) AS copies
       |FROM cum
       |ORDER BY doc_id""".stripMargin
  }
}
