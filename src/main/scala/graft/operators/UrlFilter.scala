package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Parity.{r, rsql}

/** URL / DOMAIN gating (round 8) — the C4/RefinedWeb-style provenance
  * filter: extract every http(s) URL from the text, normalize its domain,
  * and gate the document on (a) a domain BLOCKLIST hit and (b) LINK
  * DENSITY (link-farm pages are mostly URLs; prose is not). Emits the
  * per-doc URL count, distinct-domain count, the sorted domain list (as
  * one comma-joined string — stable to hash), the blocklist verdict, the
  * density, and the composed keep gate.
  *
  * The URL pattern lives in the Java∩RE2 dialect intersection (the
  * [[PiiRedact]] discipline): character classes, optional non-capturing
  * path group, no lookaround. The path charset excludes sentence
  * punctuation and its last char must be alphanumeric or '/', so a URL
  * followed by ')' or '.' doesn't swallow the punctuation (fixture-pinned:
  * `(https://docs.example.io/guide)` and `http://ex.io/g.`). Domains are
  * lowercased before comparison — a blocklisted domain can't hide behind
  * case (fixture-pinned: `SPAM.example.com`).
  *
  * Scale shape: pure fused map pass — regexp_extract_all + per-element
  * transforms, ZERO exchanges before the output sort (spec-pinned). Runs
  * here over a committed URL-planting JSONL fixture (the corpus tables
  * are bare word streams); the operator takes any (doc_id, text) frame.
  */
object UrlFilter {

  val FixtureDir = "/root/repo/fixtures/url_docs"

  /** http(s) URL whose optional path ends in [A-Za-z0-9/] — trailing
    * sentence punctuation stays outside the match. */
  val UrlRe = "https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._~/?#&=%-]*[A-Za-z0-9/])?"
  val DomainRe = "^https?://([A-Za-z0-9.-]+)"

  val BlockedDomains: Seq[String] = Seq("spam.example.com", "tracker.example.net")
  val MaxLinkDensity = 0.3

  private val blockedIn = BlockedDomains.map(d => s"'$d'").mkString(", ")
  private def sq(re: String) = re.replace("\\", "\\\\")

  /** URL extraction + domain gates over any (doc_id, text) frame. */
  def urlDomainFilter(documents: DataFrame): DataFrame =
    documents
      .withColumn("urls", expr(s"regexp_extract_all(coalesce(text, ''), '${sq(UrlRe)}', 0)"))
      .withColumn("domains",
        expr(s"transform(urls, u -> lower(regexp_extract(u, '${sq(DomainRe)}', 1)))"))
      .withColumn("n_urls", expr("size(urls)"))
      .withColumn("n_domains", expr("size(array_distinct(domains))"))
      .withColumn("domains_csv",
        expr("array_join(array_sort(array_distinct(domains)), ',')"))
      .withColumn("has_blocked", expr(s"exists(domains, d -> d IN ($blockedIn))"))
      .withColumn("n_tokens", expr("size(split(trim(coalesce(text, '')), '\\\\s+'))"))
      .withColumn("link_density", expr("CAST(n_urls AS DOUBLE) / n_tokens"))
      .withColumn("keep",
        !col("has_blocked") && col("link_density") <= MaxLinkDensity)
      .select(col("doc_id"), col("n_urls"), col("n_domains"), col("domains_csv"),
        col("has_blocked"), col("link_density"), col("keep"))

  private val FixtureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  def urlDomainFilterQ(spark: SparkSession): DataFrame =
    urlDomainFilter(spark.read.schema(FixtureSchema).json(s"$FixtureDir/*.jsonl"))
      .select(col("doc_id"), col("n_urls"), col("n_domains"), col("domains_csv"),
        col("has_blocked"), r("link_density", 4), col("keep"))
      .orderBy("doc_id")

  val urlDomainFilterSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         regexp_extract_all(COALESCE(text, ''), '$UrlRe') AS urls,
       |         len(string_split_regex(trim(COALESCE(text, '')), '\\s+')) AS n_tokens
       |  FROM read_json('$FixtureDir/*.jsonl', format = 'newline_delimited',
       |                 columns = {doc_id: 'BIGINT', text: 'VARCHAR'})
       |), dom AS (
       |  SELECT doc_id, urls, n_tokens,
       |         list_transform(urls, u -> lower(regexp_extract(u, '$DomainRe', 1))) AS domains
       |  FROM d
       |), v AS (
       |  SELECT doc_id,
       |         CAST(len(urls) AS INT) AS n_urls,
       |         CAST(len(list_distinct(domains)) AS INT) AS n_domains,
       |         COALESCE(array_to_string(list_sort(list_distinct(domains)), ','), '') AS domains_csv,
       |         len(list_filter(domains, x -> x IN ($blockedIn))) > 0 AS has_blocked,
       |         CAST(len(urls) AS DOUBLE) / n_tokens AS link_density
       |  FROM dom
       |)
       |SELECT doc_id, n_urls, n_domains, domains_csv, has_blocked,
       |       ${rsql("link_density", 4, "link_density")},
       |       (NOT has_blocked) AND link_density <= CAST($MaxLinkDensity AS DOUBLE) AS keep
       |FROM v
       |ORDER BY doc_id""".stripMargin
}
