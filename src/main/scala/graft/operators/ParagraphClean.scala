package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Surgical sub-document removal (round 8, continuation) — the CONSUMER of
  * the paragraph-dedup verdicts: [[ParagraphDedup]] gates whole docs and
  * [[DupSpans]] reports removable extents; this operator actually performs
  * the cut — drop every duplicated window (first occurrences stay, exactly
  * the verdict convention) and reassemble the surviving windows, in order,
  * into the cleaned text the training corpus ships. A doc stitched half
  * from boilerplate keeps its fresh half instead of being all-or-nothing
  * gated — the standard line between document-level and span-level dedup
  * in pretraining pipelines.
  *
  * Semantics: windows, fingerprints, and duplicate-of-earlier verdicts are
  * exactly [[ParagraphDedup.paragraphVerdicts]]'; cleaning keeps the
  * non-duplicate windows and space-joins them in window order. Token
  * counts follow: `n_tokens_clean` counts the kept windows' tokens (the
  * short last window contributes its true length). Degenerate convention
  * (both engines): NULL/empty text → zero windows → clean_text '' with
  * counts 0 (left join + coalesce).
  *
  * Scale shape — the reason this is not "join the window text back": the
  * verdict side reduces to (doc_id, sorted dup-index array), ≤ one row per
  * doc with a ≤|windows|-int payload, via ONE doc-keyed aggregation on the
  * already-checkpointed fp index; window TEXT never enters the fingerprint
  * shuffle. Reassembly is a pure map over the original doc row (re-window
  * the text, drop indices in the dup array, array_join) after one
  * doc-keyed left join of that integer frame. The documents scan runs
  * twice (once under the verdict index, once as the reassembly spine) —
  * the [[Curation.qualitySelect]] two-pass trade, BY DESIGN: rescanning
  * the corpus beats shuffling its full text through the fp exchange.
  *
  * Reference relation: extends §2.C sub-document dedup (#52/#75) with the
  * removal pass itself; the reference (atomic EEG rows) has no analog.
  */
object ParagraphClean {

  /** Cleaned corpus: duplicated windows excised, survivors re-joined. */
  def paragraphClean(documents: DataFrame,
                     width: Int = ParagraphDedup.ParaWindowTokens): DataFrame = {
    val dupIdx = ParagraphDedup.paragraphVerdicts(documents, width)
      .filter(col("is_dup"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("para_idx"))).as("di"))
    documents
      .select(col("doc_id"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))
      .join(dupIdx, Seq("doc_id"), "left")
      .withColumn("dup_idx", coalesce(col("di"), expr("array()")))
      .withColumn("paras", expr(ParagraphDedup.paraArrayExpr(width)))
      .withColumn("clean_arr",
        expr("""transform(
               |  filter(transform(paras, (p, i) -> struct(p AS p, i AS i)),
               |         s -> NOT array_contains(dup_idx, s.i)),
               |  s -> s.p)""".stripMargin))
      .select(col("doc_id"),
        expr("array_join(clean_arr, ' ')").as("clean_text"),
        expr("CAST(size(paras) AS BIGINT)").as("n_paras"),
        expr("CAST(size(dup_idx) AS BIGINT)").as("n_removed"),
        expr("""CAST(aggregate(clean_arr, 0,
               |  (acc, p) -> acc + size(split(p, ' ')), acc -> acc) AS BIGINT)"""
          .stripMargin).as("n_tokens_clean"))
  }

  def paragraphCleanQ(documents: DataFrame): DataFrame =
    paragraphClean(documents).orderBy("doc_id")

  /** DuckDB twin: [[ParagraphDedup.paragraphDedupSql]]'s verdict chain
    * carrying para_idx (as in [[DupSpans.dupSpanMergeSql]]), dup indices
    * listed per doc, and the same keep-filter + rejoin as an indexed list
    * comprehension. DuckDB `array_to_string([], ' ')` is NULL (the
    * [[LineFilter]] pin) — COALESCE'd to '' to match Spark's empty join. */
  /** The verdict + keep-filter CTE chain over any source table carrying
    * (doc_id, text) — shared verbatim by [[paragraphCleanSql]] and the
    * composed [[Pipeline.curationPipelineSql]] so the two oracles cannot
    * drift. Ends at `k` (doc_id, paras, dup_idx, clean_arr). */
  private[graft] def cleanChainCtes(src: String): String = {
    val wdt = ParagraphDedup.ParaWindowTokens
    s"""toks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM $src
       |), g AS (
       |  SELECT doc_id,
       |         [array_to_string(w[s*$wdt+1 : s*$wdt+$wdt], ' ')
       |          for s in range(0, CAST(ceil(len(w) / $wdt.0) AS BIGINT))] AS paras
       |  FROM toks
       |), ex AS (
       |  SELECT doc_id, CAST(unnest(range(len(paras))) AS INT) AS para_idx,
       |         md5(unnest(paras)) AS fp
       |  FROM g
       |), f1 AS (
       |  SELECT fp, min(doc_id) AS first_doc FROM ex GROUP BY 1
       |), f2 AS (
       |  SELECT ex.fp, min(ex.para_idx) AS first_idx
       |  FROM ex JOIN f1 ON ex.fp = f1.fp AND ex.doc_id = f1.first_doc
       |  GROUP BY 1
       |), v AS (
       |  SELECT ex.doc_id, ex.para_idx
       |  FROM ex JOIN f1 USING (fp) JOIN f2 USING (fp)
       |  WHERE ex.doc_id <> f1.first_doc OR ex.para_idx <> f2.first_idx
       |), di AS (
       |  SELECT doc_id, list(para_idx ORDER BY para_idx) AS dup_idx
       |  FROM v GROUP BY 1
       |), k AS (
       |  SELECT g.doc_id, paras, COALESCE(dup_idx, []) AS dup_idx,
       |         [paras[CAST(i AS INT) + 1] for i in range(len(paras))
       |          if NOT list_contains(COALESCE(dup_idx, []), CAST(i AS INT))] AS clean_arr
       |  FROM g LEFT JOIN di ON di.doc_id = g.doc_id
       |)""".stripMargin
  }

  val paragraphCleanSql: String =
    s"""WITH ${cleanChainCtes("documents")}
       |SELECT doc_id, COALESCE(array_to_string(clean_arr, ' '), '') AS clean_text,
       |       CAST(len(paras) AS BIGINT) AS n_paras,
       |       CAST(len(dup_idx) AS BIGINT) AS n_removed,
       |       CAST(COALESCE(list_sum([len(string_split(p, ' ')) for p in clean_arr]), 0) AS BIGINT)
       |         AS n_tokens_clean
       |FROM k
       |ORDER BY doc_id""".stripMargin
}
