package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Parity.{r, rsql}

/** HTML boilerplate stripping (round 8, continuation) — the ingestion-side
  * extraction step every web-scraped corpus runs BEFORE the text operators
  * this suite already ships (quality, dedup, lang-id all assume prose):
  * drop comments and script/style blocks wholesale, strip residual tags,
  * decode the core character entities, collapse whitespace, and gate on
  * extracted-text mass — the trafilatura/jusText-class pass reduced to its
  * deterministic regex core.
  *
  * Patterns live in the Java∩RE2 dialect intersection (the [[PiiRedact]]
  * discipline) with inline `(?is)` flags so one pattern text serves both
  * engines (DuckDB takes only the explicit 'g' option). Order matters and
  * is pinned: comments → script blocks → style blocks (non-greedy spans,
  * dot-matches-newline) → residual tags → entity decode (`&amp;` LAST so
  * `&amp;lt;` decodes once, to `&lt;` as text) → whitespace collapse.
  * Tags are replaced by a SPACE, not '', so `<p>a</p><p>b</p>` doesn't
  * glue words. Known approximation, fixture-pinned rather than hidden: a
  * literal '>' inside a quoted attribute ends the tag match early — the
  * canonical regex-vs-parser counterexample; a production extractor
  * swaps this stage for a real parser behind the same frame contract.
  *
  * Gate: keep iff `clean/raw ratio ≥ `[[MinTextRatio]] (boilerplate-heavy
  * pages are mostly markup) AND `n_chars_clean ≥ `[[MinChars]] (empty
  * shells). NULL text → ''/0/0/0.0/false.
  *
  * Scale shape: pure fused map pass, ZERO exchanges before the output
  * sort (spec-pinned) — the [[PiiRedact]] plan class, embarrassingly
  * parallel at any corpus size. Runs over a committed HTML-planting JSONL
  * fixture (the corpus tables are bare word streams); the operator takes
  * any (doc_id, text) frame.
  */
object HtmlClean {

  val FixtureDir = "/root/repo/fixtures/html_docs"

  val MinChars = 20
  val MinTextRatio = 0.1

  val CommentRe = "(?s)<!--.*?-->"
  val ScriptRe = "(?is)<script[^>]*>.*?</script>"
  val StyleRe = "(?is)<style[^>]*>.*?</style>"
  val TagRe = "<[^>]+>"

  /** Entity table; `&amp;` deliberately last (see scaladoc). The
    * apostrophe replacement is `chr(39)` so the expression text needs no
    * quote-escaping in either engine. */
  private val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "'<'", "&gt;" -> "'>'", "&quot;" -> "'\"'",
    "&#39;" -> "chr(39)", "&nbsp;" -> "' '", "&amp;" -> "'&'")

  /** The full cleaning expression over a column named `text`, emitted for
    * either engine — identical text except DuckDB's explicit 'g' flag. */
  private def cleanExpr(duck: Boolean): String = {
    val g = if (duck) ", 'g'" else ""
    def esc(re: String) = if (duck) re else re.replace("\\", "\\\\")
    val deblocked =
      s"""regexp_replace(regexp_replace(regexp_replace(coalesce(text, ''),
         |  '${esc(CommentRe)}', ' '$g),
         |  '${esc(ScriptRe)}', ' '$g),
         |  '${esc(StyleRe)}', ' '$g)""".stripMargin
    val untagged = s"regexp_replace($deblocked, '${esc(TagRe)}', ' '$g)"
    val decoded = entities.foldLeft(untagged) { case (acc, (ent, rep)) =>
      s"replace($acc, '$ent', $rep)"
    }
    s"trim(regexp_replace($decoded, '${esc("\\s+")}', ' '$g))"
  }

  /** Extraction + mass gate over any (doc_id, text) frame. */
  def htmlClean(documents: DataFrame): DataFrame =
    documents
      .withColumn("clean_text", expr(cleanExpr(duck = false)))
      .withColumn("n_chars_raw", expr("length(coalesce(text, ''))").cast("long"))
      .withColumn("n_chars_clean", length(col("clean_text")).cast("long"))
      .withColumn("text_ratio",
        expr("CAST(n_chars_clean AS DOUBLE) / greatest(n_chars_raw, 1)"))
      .withColumn("keep",
        col("text_ratio") >= MinTextRatio && col("n_chars_clean") >= MinChars)
      .select(col("doc_id"), col("clean_text"), col("n_chars_raw"),
        col("n_chars_clean"), col("text_ratio"), col("keep"))

  private val FixtureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  def htmlCleanQ(spark: SparkSession): DataFrame =
    htmlClean(spark.read.schema(FixtureSchema).json(s"$FixtureDir/*.jsonl"))
      .select(col("doc_id"), col("clean_text"), col("n_chars_raw"),
        col("n_chars_clean"), r("text_ratio", 4), col("keep"))
      .orderBy("doc_id")

  val htmlCleanSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text
       |  FROM read_json('$FixtureDir/*.jsonl', format = 'newline_delimited',
       |                 columns = {doc_id: 'BIGINT', text: 'VARCHAR'})
       |), c AS (
       |  SELECT doc_id,
       |         ${cleanExpr(duck = true)} AS clean_text,
       |         CAST(len(COALESCE(text, '')) AS BIGINT) AS n_chars_raw
       |  FROM d
       |)
       |SELECT doc_id, clean_text, n_chars_raw,
       |       CAST(len(clean_text) AS BIGINT) AS n_chars_clean,
       |       ${rsql("CAST(len(clean_text) AS DOUBLE) / greatest(n_chars_raw, 1)", 4, "text_ratio")},
       |       (CAST(len(clean_text) AS DOUBLE) / greatest(n_chars_raw, 1) >= $MinTextRatio
       |         AND len(clean_text) >= $MinChars) AS keep
       |FROM c
       |ORDER BY doc_id""".stripMargin
}
