package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed curation pipeline (round 8, continuation) — the END-TO-END
  * recipe a corpus actually runs, as ONE registered query: admission gates
  * ([[TextOps.corpusFilter]]: quality ∧ known-language ∧ exact-dedup
  * canonical) → sub-document surgery over the admitted set
  * ([[ParagraphClean]]: duplicated windows excised) → per-source delivery
  * report (docs in/admitted, window and removal counts, clean token mass).
  * The point is compositional correctness: every stage is an
  * already-oracled operator, and this query pins that they compose — same
  * gates, same verdicts, same conventions — into the number that matters
  * downstream (tokens per source entering the mixture).
  *
  * All-integer output (counts and sums only — the stage scores stay
  * inside their stages), so cross-engine parity is exact with no float
  * rules needed. Sources with zero admitted docs keep their input row
  * (left join + coalesce, the family's 0-hit convention).
  *
  * Scale shape: the registered form recomputes the admission chain per
  * consumer (paragraphClean's two scans + the rollup join) — the
  * [[Curation.qualitySelect]] recompute-over-materialize trade, BY DESIGN
  * at gate scale. At 100 TB a pipeline materializes each stage boundary
  * as a table (the medallion layout the reference itself uses, and the
  * partitioned-write path InfraSpec pins); this query exists to pin the
  * composed SEMANTICS those materialized stages must reproduce. Within
  * the composition: the only shuffles are the admission fingerprint
  * window, the clean chain's fp exchange + doc-keyed integer join, and
  * two source-keyed rollup aggregations (≤|sources| rows out).
  *
  * Oracle: [[TextOps.qualityScoreCtes]] + the shared lang/fingerprint
  * fragments + [[ParagraphClean.cleanChainCtes]] over the admitted CTE —
  * the same fragment texts the stage oracles use, so stages cannot drift
  * from their composition.
  */
object Pipeline {

  def curationPipeline(documents: DataFrame): DataFrame = {
    val admitted = TextOps.corpusFilter(documents)
      .filter(col("admitted"))
      .select(col("doc_id"), col("text"), col("source"))
    val perDoc = ParagraphClean.paragraphClean(admitted)
      .join(admitted.select(col("doc_id"), col("source")), Seq("doc_id"))
    val inStats = documents.groupBy("source")
      .agg(count(lit(1)).as("n_docs_in"))
    val outStats = perDoc.groupBy("source")
      .agg(count(lit(1)).as("na"), sum("n_paras").as("nw"),
        sum("n_removed").as("nr"), sum("n_tokens_clean").as("tc"))
    inStats.join(outStats, Seq("source"), "left")
      .select(col("source"), col("n_docs_in"),
        coalesce(col("na"), lit(0L)).as("n_admitted"),
        coalesce(col("nw"), lit(0L)).as("n_windows"),
        coalesce(col("nr"), lit(0L)).as("n_windows_removed"),
        coalesce(col("tc"), lit(0L)).as("tokens_clean"))
  }

  def curationPipelineQ(documents: DataFrame): DataFrame =
    curationPipeline(documents).orderBy("source")

  val curationPipelineSql: String = {
    val scores = TextOps.LangMarkers
      .map { case (l, ms) => s"${TextOps.scoreExpr(ms)} AS s_$l" }
      .mkString(",\n       |         ")
    s"""WITH ${TextOps.qualityScoreCtes(Seq("text", "source"))}, scored AS (
       |  SELECT doc_id, text, source, quality_score,
       |         $scores
       |  FROM q3
       |), lp AS (
       |  SELECT doc_id, text, source, quality_score,
       |         ${TextOps.predExpr} AS pred_lang,
       |         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
       |  FROM scored
       |), fp AS (
       |  SELECT doc_id, text, source, quality_score, pred_lang,
       |         min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id
       |  FROM lp
       |), admitted AS (
       |  SELECT doc_id, text, source
       |  FROM fp
       |  WHERE quality_score >= 0.5 AND pred_lang <> 'unknown'
       |    AND doc_id = canonical_id
       |), ${ParagraphClean.cleanChainCtes("admitted")}, pd AS (
       |  SELECT k.doc_id, a.source,
       |         CAST(len(paras) AS BIGINT) AS np,
       |         CAST(len(dup_idx) AS BIGINT) AS nr,
       |         CAST(COALESCE(list_sum([len(string_split(p, ' ')) for p in clean_arr]), 0) AS BIGINT) AS tc
       |  FROM k JOIN admitted a ON a.doc_id = k.doc_id
       |), ins AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs_in
       |  FROM documents GROUP BY 1
       |), outs AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS na,
       |         CAST(sum(np) AS BIGINT) AS nw, CAST(sum(nr) AS BIGINT) AS nr,
       |         CAST(sum(tc) AS BIGINT) AS tc
       |  FROM pd GROUP BY 1
       |)
       |SELECT ins.source, n_docs_in,
       |       COALESCE(na, 0) AS n_admitted,
       |       COALESCE(nw, 0) AS n_windows,
       |       COALESCE(outs.nr, 0) AS n_windows_removed,
       |       COALESCE(tc, 0) AS tokens_clean
       |FROM ins LEFT JOIN outs ON outs.source = ins.source
       |ORDER BY ins.source""".stripMargin
  }
}
