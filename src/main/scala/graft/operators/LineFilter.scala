package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Parity.{r, rsql}

/** LINE-level cleaning (round 8) — the C4-style scrub that operates on a
  * granularity the rest of the suite doesn't touch: individual lines
  * inside a document. Web-derived text arrives with navigation menus,
  * cookie banners, script warnings and boilerplate footers interleaved
  * with the prose; the standard fix (C4's "line filters") drops every
  * line that fails cheap structural gates and re-assembles the survivors.
  * Per line (trimmed): (1) at least [[MinLineWords]] whitespace words,
  * (2) ends in terminal punctuation (`.` `!` `?` `"`), (3) contains no
  * boilerplate phrase ([[BoilerplatePhrases]], case-insensitive). Per
  * doc: line counts, survivor fraction, the CLEANED text (surviving lines
  * joined with the original newline, original spacing preserved), and a
  * doc-level gate `keep` = at least [[MinKeptLines]] surviving lines.
  *
  * Cross-engine exactness: the per-line predicate is generated from ONE
  * Scala builder with the engine-specific token-count spelling plugged in
  * (`size(split(…))` vs `len(string_split_regex(…))`); everything else —
  * `trim`, `right`, `lower … LIKE`, the lambda-filter + join shape — is
  * identical text on both engines. Outputs are integers, booleans,
  * strings, and one integer-ratio double (rounded via Parity).
  *
  * Scale shape: pure fused map pass over higher-order array functions
  * (split → filter → array_join), ZERO exchanges before the output sort
  * (spec-pinned) — no explode, no shuffle, embarrassingly parallel at any
  * corpus size. Runs here over a committed multi-line JSONL fixture
  * (fixtures/line_docs — the corpus tables are single-line word streams
  * with no line structure to clean); the operator takes any
  * (doc_id, text) frame.
  */
object LineFilter {

  val FixtureDir = "/root/repo/fixtures/line_docs"

  val MinLineWords = 3
  val MinKeptLines = 2
  val BoilerplatePhrases: Seq[String] =
    Seq("javascript", "cookie", "lorem ipsum", "all rights reserved", "terms of use")

  /** Per-line predicate over lambda variable `l`; `tokenLen` is the
    * engine's token-count spelling applied to `trim(l)`. */
  private def linePred(tokenLen: String): String = {
    val noBoiler = BoilerplatePhrases
      .map(p => s"lower(l) LIKE '%$p%'").mkString("NOT (", " OR ", ")")
    s"""$tokenLen >= $MinLineWords
       | AND right(trim(l), 1) IN ('.', '!', '?', '"')
       | AND $noBoiler""".stripMargin.replaceAll("\n", "")
  }

  private val sparkPred = linePred("size(split(trim(l), '\\\\s+'))")
  private val duckPred = linePred("len(string_split_regex(trim(l), '\\s+'))")

  /** Line gates + cleaned-text reassembly over any (doc_id, text) frame. */
  def lineFilter(documents: DataFrame): DataFrame =
    documents
      .withColumn("lines", split(coalesce(col("text"), lit("")), "\n"))
      .withColumn("kept", expr(s"filter(lines, l -> $sparkPred)"))
      .withColumn("n_lines", expr("size(lines)"))
      .withColumn("n_kept", expr("size(kept)"))
      .withColumn("kept_ratio", expr("CAST(n_kept AS DOUBLE) / n_lines"))
      .withColumn("keep", col("n_kept") >= MinKeptLines)
      .withColumn("cleaned", expr("array_join(kept, '\n')"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), col("kept_ratio"),
        col("keep"), col("cleaned"))

  private val FixtureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  def lineFilterQ(spark: SparkSession): DataFrame =
    lineFilter(spark.read.schema(FixtureSchema).json(s"$FixtureDir/*.jsonl"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"), r("kept_ratio", 4),
        col("keep"), col("cleaned"))
      .orderBy("doc_id")

  val lineFilterSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(COALESCE(text, ''), chr(10)) AS lines
       |  FROM read_json('$FixtureDir/*.jsonl', format = 'newline_delimited',
       |                 columns = {doc_id: 'BIGINT', text: 'VARCHAR'})
       |), f AS (
       |  SELECT doc_id, lines,
       |         list_filter(lines, l -> $duckPred) AS kept
       |  FROM d
       |)
       |SELECT doc_id,
       |       CAST(len(lines) AS INT) AS n_lines,
       |       CAST(len(kept) AS INT) AS n_kept,
       |       ${rsql("(CAST(len(kept) AS DOUBLE) / len(lines))", 4, "kept_ratio")},
       |       len(kept) >= $MinKeptLines AS keep,
       |       -- COALESCE: DuckDB's array_to_string([]) is NULL where
       |       -- Spark's array_join([]) is '' — the contract is ''
       |       COALESCE(array_to_string(kept, chr(10)), '') AS cleaned
       |FROM f
       |ORDER BY doc_id""".stripMargin
}
