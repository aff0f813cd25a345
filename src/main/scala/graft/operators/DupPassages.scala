package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Most-duplicated-passages report (round 8) — the "what IS our
  * boilerplate" audit: the top-K fixed-token windows that appear in the
  * most documents, with instance counts and a first-occurrence example.
  * This is the human-readable face of the paragraph-dedup machinery
  * ([[ParagraphDedup]]'s window convention, shared expression) — run it
  * before choosing dup-fraction gates and blocklists, because the top of
  * this table (nav bars, license headers, quoted footers) is exactly what
  * those gates will act on. Cross-DOC duplication only (`n_docs ≥ 2`);
  * within-doc repetition is [[Curation.ngramRepetition]]'s signal.
  *
  * Scale shape: inline-generator window explode → one groupBy on the
  * window string (map-side combinable counts) → TakeOrderedAndProject
  * top-K — per-partition partial top-K, NO global sort (the
  * [[Vocab]] pattern, spec-pinned); the only driver-sized structure is
  * the K-row report itself. At 100 TB the group key would be the window
  * fp with text joined back for the K survivors only; at gate scale the
  * 8-token window string rides the shuffle directly (the md5 is emitted
  * anyway for joining against the dedup tables).
  */
object DupPassages {

  val TopK = 40

  def dupPassages(documents: DataFrame,
                  width: Int = ParagraphDedup.ParaWindowTokens,
                  k: Int = TopK): DataFrame =
    documents
      .select(col("doc_id"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))
      .select(col("doc_id"),
        explode(expr(ParagraphDedup.paraArrayExpr(width))).as("passage"))
      .groupBy("passage")
      .agg(count(lit(1)).as("n_instances"),
        countDistinct(col("doc_id")).as("n_docs"),
        min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_instances").desc, col("passage"))
      .limit(k)
      .select(expr("md5(passage)").as("fp"), col("passage"),
        col("n_instances"), col("n_docs"), col("first_doc"))

  def dupPassagesQ(documents: DataFrame): DataFrame =
    dupPassages(documents).orderBy(col("n_instances").desc, col("passage"))

  val dupPassagesSql: String = {
    val wdt = ParagraphDedup.ParaWindowTokens
    s"""WITH toks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |         [array_to_string(w[s*$wdt+1 : s*$wdt+$wdt], ' ')
       |          for s in range(0, CAST(ceil(len(w) / $wdt.0) AS BIGINT))] AS paras
       |  FROM toks
       |), ex AS (
       |  SELECT doc_id, unnest(paras) AS passage FROM g
       |), agg AS (
       |  SELECT passage,
       |         CAST(count(*) AS BIGINT) AS n_instances,
       |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |         min(doc_id) AS first_doc
       |  FROM ex
       |  GROUP BY passage
       |)
       |SELECT md5(passage) AS fp, passage, n_instances, n_docs, first_doc
       |FROM agg
       |WHERE n_docs >= 2
       |ORDER BY n_instances DESC, passage
       |LIMIT $TopK""".stripMargin
  }
}
