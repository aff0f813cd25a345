package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VOCABULARY GROWTH CURVE (round 8, continuation 5) — the Heaps-law
  * readout: distinct vocabulary size after 1/8, 1/4, 1/2 and all of
  * the corpus (doc-id prefixes), with the token mass of each prefix —
  * the curve that says whether the vocabulary is SATURATING (shared
  * language, a fixed vocab will hold) or still growing linearly
  * (open vocabulary — the [[Curation.tfidfTopTerms]] broadcast-dial
  * regime, and the fact [[Vocab.vocabBuild]]'s K must be sized
  * against). [[VocabCoverage]] prices ONE vocab against the corpus;
  * this prices the corpus' own growth law.
  *
  * The trick that makes it ONE pass instead of |prefixes| distinct
  * aggregations: a term is in prefix k iff its FIRST document is —
  * so `min(doc_id) per term` (one combinable agg) turns every prefix
  * distinct-count into a conditional count over the terms frame
  * (the [[GrowthAccounting]] first-seen idea applied to vocabulary).
  *
  * Cross-engine exactness (SURVEY §6): prefix membership is the
  * integer cross product `fd·8 < n_ids·k` off the 1-row max-doc-id
  * fact (no division at all); exact BIGINT counts; unigram
  * tokenization is the shared split-lower-trim convention.
  *
  * Scale shape: one inline-exploded token stream → per-term min agg
  * (terms frame, vocabulary-sized), one map pass for per-doc token
  * counts, two 1-row conditional aggregates stacked to 4 rows. The
  * doc-id prefix is a PROXY for ingestion order (ids are assigned in
  * arrival order in this lake); a production run would key on the
  * ingest timestamp with identical algebra.
  */
object VocabGrowth {

  /** Prefix sizes in eighths of the doc-id space. */
  val Eighths: Seq[Int] = Seq(1, 2, 4, 8)

  def vocabGrowthCurve(documents: DataFrame): DataFrame = {
    val mx = documents.agg((max("doc_id") + 1).as("n_ids"))
    val firstDoc = documents
      .select(col("doc_id"), explode(expr(
        "coalesce(split(lower(trim(text)), '\\\\s+'), array())")).as("term"))
      .groupBy("term").agg(min("doc_id").as("fd"))
    val tCols = Eighths.map(k =>
      sum(expr(s"CASE WHEN fd * 8 < n_ids * $k THEN 1 ELSE 0 END")).as(s"t$k"))
    val termAgg = firstDoc.crossJoin(broadcast(mx))
      .agg(tCols.head, tCols.tail: _*)
    val dCols = Eighths.map(k =>
      sum(expr(s"CASE WHEN doc_id * 8 < n_ids * $k THEN 1 ELSE 0 END")).as(s"d$k")) ++
      Eighths.map(k =>
        sum(expr(s"CASE WHEN doc_id * 8 < n_ids * $k THEN CAST(ntok AS BIGINT) ELSE 0 END"))
          .as(s"n$k"))
    val docAgg = documents
      .select(col("doc_id"),
        expr("size(coalesce(split(lower(trim(text)), '\\\\s+'), array()))").as("ntok"))
      .crossJoin(broadcast(mx))
      .agg(dCols.head, dCols.tail: _*)
    val stackArgs = Eighths
      .map(k => s"CAST($k AS BIGINT), d$k, n$k, t$k").mkString(", ")
    termAgg.crossJoin(docAgg)
      .selectExpr(s"stack(${Eighths.size}, $stackArgs) " +
        "AS (prefix_eighths, n_docs, n_tokens, n_terms)")
      .filter(col("n_docs").isNotNull)
  }

  def vocabGrowthCurveQ(documents: DataFrame): DataFrame =
    vocabGrowthCurve(documents).orderBy("prefix_eighths")

  val vocabGrowthCurveSql: String = {
    val tcols = Eighths.map(k =>
      s"CAST(sum(CASE WHEN fd * 8 < n_ids * $k THEN 1 ELSE 0 END) AS BIGINT) AS t$k")
      .mkString(",\n       |         ")
    val dcols = (Eighths.map(k =>
      s"CAST(sum(CASE WHEN doc_id * 8 < n_ids * $k THEN 1 ELSE 0 END) AS BIGINT) AS d$k") ++
      Eighths.map(k =>
        s"CAST(sum(CASE WHEN doc_id * 8 < n_ids * $k THEN ntok ELSE 0 END) AS BIGINT) AS n$k"))
      .mkString(",\n       |         ")
    val rows = Eighths.map(k =>
      s"SELECT CAST($k AS BIGINT) AS prefix_eighths, d$k AS n_docs, n$k AS n_tokens, t$k AS n_terms FROM ta CROSS JOIN da")
      .mkString("\n       |  UNION ALL ")
    s"""WITH mx AS (
       |  SELECT max(doc_id) + 1 AS n_ids FROM documents
       |), fdoc AS (
       |  SELECT u.term, min(d.doc_id) AS fd
       |  FROM documents d,
       |       unnest(string_split_regex(lower(trim(d.text)), '\\s+')) AS u(term)
       |  GROUP BY 1
       |), ta AS (
       |  SELECT $tcols
       |  FROM fdoc CROSS JOIN mx
       |), dt AS (
       |  SELECT doc_id,
       |         CAST(COALESCE(len(string_split_regex(lower(trim(text)), '\\s+')), 0) AS BIGINT) AS ntok
       |  FROM documents
       |), da AS (
       |  SELECT $dcols
       |  FROM dt CROSS JOIN mx
       |), rows_out AS (
       |  $rows
       |)
       |SELECT prefix_eighths, n_docs, n_tokens, n_terms
       |FROM rows_out
       |WHERE n_docs IS NOT NULL
       |ORDER BY prefix_eighths""".stripMargin
  }
}
