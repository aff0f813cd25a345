package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Keyword retrieval (round 8, continuation) — ranked document search over
  * the corpus for a fixed multi-term query: the missing RETRIEVAL side of
  * the text suite ([[Curation.tfidfTopTerms]] ranks terms per source; this
  * ranks DOCUMENTS per query — the eval-harness / RAG-corpus lookup
  * primitive a training-data pipeline runs constantly).
  *
  * Scoring is tf·idf with QUANTIZED integer idf weights (the §6 float
  * discipline, same move as [[Collocations]]' lift and
  * [[Curation.tfidfTopTerms]]' ratio-idf): `idf_w(t) = (N · 10⁶) div
  * df(t)` — integer floor division, identical on both engines for
  * positive operands — and `score_i(d) = Σ_t tf(t,d) · idf_w(t)`, a pure
  * BIGINT sort key. No `ln`, no float sums, no cross-engine tie risk; the
  * displayed double `score = score_i / 10⁶` is Parity-rounded for the
  * hash. idf_w stays comfortably in int64 to ~10¹² docs (N·10⁶ ≤ 10¹⁸);
  * score_i adds only `max_tf · |Q|` bits on top.
  *
  * Scale shape: the query-term hits are FILTERED INSIDE THE TOKEN ARRAY
  * before the explode (`filter(w, t -> t IN Q)` at the Generate child —
  * the inline-generator discipline), so the exploded stream is |Q|-bounded
  * per doc, not |tokens|; tf is a map-side-combinable count; df/weights
  * are |Q|-row frames (AQE broadcasts them for free); the top-K cut is
  * `orderBy().limit(K)` → TakeOrderedAndProject, never a global sort; the
  * provenance join-back runs AFTER the cut with the K-row side broadcast
  * (constant-size hint — the round-8 no-corpus-proportional-hints rule
  * allows fixed-K frames).
  *
  * Reference relation: extends §2's text family; the reference
  * (read_gold.py:38-54) only does SQL-side filtering, not ranked search.
  */
object KeywordSearch {

  /** Fixed demo query (sorted; terms from the corpus vocabulary). */
  val QueryTerms: Seq[String] = Seq("join", "scan", "spark", "window")

  /** idf quantization scale — 6 decimal digits of idf resolution. */
  val IdfScale = 1000000L

  val TopK = 50

  private def termsIn = QueryTerms.map(t => s"'$t'").mkString(", ")

  def keywordSearch(documents: DataFrame, k: Int = TopK): DataFrame = {
    val hits = documents
      .select(col("doc_id"),
        explode(expr(
          s"filter(coalesce(split(lower(trim(text)), '\\\\s+'), array()), t -> t IN ($termsIn))"))
          .as("term"))
    // tf feeds TWO consumers (the df/weights derivation and the scoring
    // join) — checkpoint per the multi-consumer invariant or Catalyst
    // re-runs the corpus explode+aggregate once per consumer; the frame
    // is ≤ |Q|·|docs| rows, orders smaller than the corpus it summarizes
    val tf = hits.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val nDocs = documents.agg(count(lit(1)).as("n_docs"))
    val weights = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(nDocs)
      .withColumn("idf_w", expr(s"(n_docs * $IdfScale) div df"))
    val scored = tf.join(weights.select("term", "idf_w"), Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(expr("tf * idf_w")).as("score_i"))
      .orderBy(col("score_i").desc, col("doc_id"))
      .limit(k)
    scored
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_i").desc, col("doc_id"))))
      .join(documents.select("doc_id", "lang", "source"), Seq("doc_id"))
      .select(col("rank"), col("doc_id"), col("lang"), col("source"),
        col("n_terms"), col("score_i"),
        r(s"(CAST(score_i AS DOUBLE) / CAST($IdfScale AS DOUBLE))", 6).as("score"))
  }

  def keywordSearchQ(documents: DataFrame): DataFrame =
    keywordSearch(documents).orderBy("rank")

  /** DuckDB twin: same filtered unnest, integer floor-div weights, BIGINT
    * sort key, identical tie-breaks. */
  val keywordSearchSql: String =
    s"""WITH hits AS (
       |  SELECT doc_id,
       |         unnest(list_filter(COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []),
       |                            t -> t IN ($termsIn))) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM hits GROUP BY 1, 2
       |), nd AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
       |), weights AS (
       |  SELECT term, (n_docs * $IdfScale) // CAST(count(*) AS BIGINT) AS idf_w
       |  FROM tf CROSS JOIN nd GROUP BY term, n_docs
       |), scored AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |         CAST(sum(tf * idf_w) AS BIGINT) AS score_i
       |  FROM tf JOIN weights USING (term)
       |  GROUP BY 1
       |  ORDER BY score_i DESC, doc_id LIMIT $TopK
       |)
       |SELECT CAST(row_number() OVER (ORDER BY score_i DESC, s.doc_id) AS INT) AS rank,
       |       s.doc_id, d.lang, d.source, n_terms, score_i,
       |       ${rsql(s"(CAST(score_i AS DOUBLE) / CAST($IdfScale AS DOUBLE))", 6, "score")}
       |FROM scored s JOIN documents d ON s.doc_id = d.doc_id
       |ORDER BY rank""".stripMargin
}
