package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical-URL resolution (round 8, continuation) — the web-corpus
  * provenance-dedup pass [[UrlFilter]] gates need next: the SAME resource
  * appears under many spellings (host case, tracking params, fragments,
  * trailing slashes), and crawl dedup / link-graph construction both key
  * on the canonical form. Emits one row per canonical URL with its
  * reference mass: total occurrences, distinct citing docs, distinct raw
  * spellings, and the first citing doc.
  *
  * Canonicalization is a FIXED ordered regex pipeline written identically
  * in both engines (Java∩RE2 dialect, the [[PiiRedact]] discipline):
  * strip fragment → strip `utm_*` params (mid-query, then query-leading,
  * then query-only) → lowercase scheme+host → strip one trailing slash.
  * Param ORDER is deliberately preserved (`?a&b` ≠ `?b&a`): reordering
  * changes semantics for some endpoints, so it is out of the canonical
  * contract (fixture-pinned in doc 7). Ports never appear because
  * [[UrlFilter.UrlRe]]'s host class excludes ':' — one shared extraction
  * pattern across both URL operators.
  *
  * Scale shape: fused map pass (extract_all + per-URL regex chain at the
  * inline Generate child) → ONE map-side-combinable aggregation keyed on
  * the canonical string. Mega-cited URLs (every crawl has a handful) are
  * absorbed by partial aggregation, not a skew hazard. Runs here over a
  * committed variant-planting JSONL fixture (the corpus tables carry no
  * URLs); the operator takes any (doc_id, text) frame.
  */
object UrlCanon {

  val FixtureDir = "/root/repo/fixtures/url_canon"

  /** Ordered (pattern, replacement) canonicalization steps over one URL.
    * Patterns are RE2∩Java; DuckDB applies them with the 'g' flag, Spark's
    * regexp_replace is global by default — step 2 is the only one that can
    * match twice. */
  val CanonSteps: Seq[(String, String)] = Seq(
    ("#.*", ""),                // fragment
    ("&utm_[^&]*", ""),         // utm params after the first param
    ("\\?utm_[^&]*&", "?"),     // utm as first param with a survivor after
    ("\\?utm_[^&]*$", ""))      // utm as the only param

  private def sq(re: String) = re.replace("\\", "\\\\")

  /** Spark expression: the step chain + scheme/host lowercasing over `u`. */
  private val canonExpr: String = {
    val stepped = CanonSteps.foldLeft("u") { case (acc, (p, r)) =>
      s"regexp_replace($acc, '${sq(p)}', '$r')" }
    s"""concat(regexp_extract($stepped, '^(https?)://', 1), '://',
       |  lower(regexp_extract($stepped, '${sq(UrlFilter.DomainRe)}', 1)),
       |  regexp_replace(regexp_replace($stepped, '^https?://[A-Za-z0-9.-]+', ''), '/$$', ''))"""
      .stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[canonExpr]] (explicit 'g' on the global step). */
  private val canonSqlExpr: String = {
    val stepped = CanonSteps.zipWithIndex.foldLeft("u") {
      case (acc, ((p, r), i)) =>
        val flag = if (i == 1) ", 'g'" else ""
        s"regexp_replace($acc, '$p', '$r'$flag)" }
    s"""regexp_extract($stepped, '^(https?)://', 1) || '://' ||
       |  lower(regexp_extract($stepped, '${UrlFilter.DomainRe}', 1)) ||
       |  regexp_replace(regexp_replace($stepped, '^https?://[A-Za-z0-9.-]+', ''), '/$$', '')"""
      .stripMargin.replace("\n", " ")
  }

  /** Canonical-URL reference rollup over any (doc_id, text) frame. */
  def urlCanonicalize(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all(coalesce(text, ''), '${sq(UrlFilter.UrlRe)}', 0)"))
          .as("u"))
      .withColumn("canon_url", expr(canonExpr))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_refs"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("u")).as("n_variants"),
        min(col("doc_id")).as("first_doc"))

  private val FixtureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  def urlCanonicalizeQ(spark: SparkSession): DataFrame =
    urlCanonicalize(spark.read.schema(FixtureSchema).json(s"$FixtureDir/*.jsonl"))
      .orderBy("canon_url")

  val urlCanonicalizeSql: String =
    s"""WITH refs AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(COALESCE(text, ''), '${UrlFilter.UrlRe}')) AS u
       |  FROM read_json('$FixtureDir/*.jsonl', format = 'newline_delimited',
       |                 columns = {doc_id: 'BIGINT', text: 'VARCHAR'})
       |), canon AS (
       |  SELECT doc_id, u, $canonSqlExpr AS canon_url FROM refs
       |)
       |SELECT canon_url,
       |       CAST(count(*) AS BIGINT) AS n_refs,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT u) AS BIGINT) AS n_variants,
       |       min(doc_id) AS first_doc
       |FROM canon
       |GROUP BY 1
       |ORDER BY canon_url""".stripMargin
}
