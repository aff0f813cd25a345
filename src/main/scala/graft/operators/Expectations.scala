package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXPECTATIONS REPORT (round 10) — the declarative data-quality contract
  * of the lake family (Delta Live Tables `EXPECT` / Deequ constraint
  * verification, public designs): a fixed rule set evaluated against the
  * corpus in ONE pass, each rule reporting its violation count and exact
  * integer pass rate. The curation reading: the go/no-go gate a 100 TB
  * ingest runs before anything downstream trusts the batch.
  *
  * Rules (row-local predicates + one uniqueness constraint):
  *  - `doc_id_not_null`, `text_not_null` — presence
  *  - `text_nonempty` — trim(text) <> ''
  *  - `n_chars_consistent` — n_chars = length(text) (metadata agrees
  *    with payload; NULL text counts as violating — a row with no
  *    payload cannot certify its metadata)
  *  - `lang_known` — lang IS NOT NULL AND lang <> ''
  *  - `doc_id_unique` — duplicates = n_rows − distinct ids (COUNT
  *    DISTINCT excludes NULL keys in both engines, so every NULL-id row
  *    also counts here — consistent, and independently flagged by
  *    `doc_id_not_null`)
  *
  * Plan shape: every row-local rule is a SUM(CASE) in the SAME single
  * aggregation, uniqueness rides the same pass as COUNT(DISTINCT doc_id)
  * (Spark plans the two-phase distinct agg — still one scan), and the
  * 1-row result UNPIVOTS to rule rows via the [[TableProfile]]
  * stack idiom. Zero joins, one exchange (the global agg), rule count
  * is the only width. pass_ppm is exact integer:
  * `((n_rows − viol)·10⁶) div n_rows`, 10⁶ on an empty corpus (an empty
  * batch violates nothing — day-one totality).
  */
object Expectations {

  /** (rule name, violation predicate as a CASE sum expression). */
  private val RowRules: Seq[(String, String)] = Seq(
    ("doc_id_not_null", "doc_id IS NULL"),
    ("text_not_null", "text IS NULL"),
    ("text_nonempty", "text IS NULL OR trim(text) = ''"),
    ("n_chars_consistent", "text IS NULL OR n_chars IS NULL OR n_chars <> length(text)"),
    ("lang_known", "lang IS NULL OR lang = ''"))

  def expectationsReport(documents: DataFrame): DataFrame = {
    val sums = RowRules.map { case (name, pred) =>
      sum(expr(s"CASE WHEN $pred THEN 1 ELSE 0 END")).as(s"v_$name")
    } ++ Seq(
      count(lit(1)).as("n_rows"),
      countDistinct(col("doc_id")).as("n_ids"))
    val one = documents.agg(sums.head, sums.tail: _*)
    val stackArgs = (RowRules.map { case (name, _) =>
      s"'$name', v_$name"
    } :+ "'doc_id_unique', n_rows - n_ids").mkString(", ")
    one.select(col("n_rows"),
      expr(s"stack(${RowRules.size + 1}, $stackArgs) AS (rule, n_violations)"))
      .select(col("rule"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"))
      .withColumn("pass_ppm", expr(
        "CASE WHEN n_rows = 0 THEN CAST(1000000 AS BIGINT) " +
          "ELSE ((n_rows - n_violations) * 1000000) div n_rows END"))
  }

  def expectationsReportQ(documents: DataFrame): DataFrame =
    expectationsReport(documents).orderBy("rule")

  /** DuckDB twin: identical CASE sums, UNION ALL unpivot. */
  val expectationsReportSql: String = {
    val ruleRows = (RowRules.map { case (name, pred) =>
      s"SELECT '$name' AS rule, CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS v FROM documents"
    } :+
      "SELECT 'doc_id_unique', CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) FROM documents")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH tot AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_rows FROM documents
       |), v AS (
       |  $ruleRows
       |)
       |SELECT rule, n_rows, COALESCE(v, 0) AS n_violations,
       |       CASE WHEN n_rows = 0 THEN CAST(1000000 AS BIGINT)
       |            ELSE ((n_rows - COALESCE(v, 0)) * 1000000) // n_rows END AS pass_ppm
       |FROM v, tot
       |ORDER BY rule""".stripMargin
  }
}
