package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII detection + redaction (round 8) — the pre-release scrub pass every
  * public training corpus goes through (the C4/Dolma-style stage): detect
  * email addresses, IPv4 literals and international phone numbers, count
  * them per document, and emit the redacted text with typed placeholders.
  * A corpus is gated on `has_pii` or shipped redacted; both signals come
  * from this one map pass.
  *
  * The patterns are deliberately in the REGEX DIALECT INTERSECTION of
  * Java (Spark) and RE2 (DuckDB): character classes, bounded repetition,
  * `\b` anchors — no backreferences, no lookaround, no alternation whose
  * leftmost-first/leftmost-longest semantics could diverge between the
  * engines. Replacement order is emails → IPs → phones so placeholder
  * text can never feed a later pattern. Redaction is `regexp_replace`
  * (all occurrences on both engines; DuckDB takes the explicit 'g'
  * flag).
  *
  * Scale shape: pure fused map pass, zero exchanges (spec-pinned) —
  * embarrassingly parallel at any corpus size, the same plan class as
  * doc_ngram_repetition. Runs here over a committed JSONL fixture
  * (fixtures/pii_docs — the corpus tables are synthetic word streams
  * with no PII to find, so the fixture plants every pattern class plus
  * the near-miss cases); the operator itself takes any frame with
  * (doc_id, text).
  */
object PiiRedact {

  val FixtureDir = "/root/repo/fixtures/pii_docs"

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** 4 dotted octets with word boundaries: version strings ("1.2") and
    * longer dotted tuples don't match. */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International form: +CC then 3 groups with optional space/dash. */
  val PhoneRe = "\\+\\d{1,3}[ -]?\\d{3}[ -]?\\d{3,4}[ -]?\\d{3,4}"

  private def sq(re: String) = re.replace("\\", "\\\\")

  /** Detection + redaction over any (doc_id, text) frame. */
  def piiRedact(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_emails", expr(s"size(regexp_extract_all(text, '${sq(EmailRe)}', 0))"))
      .withColumn("n_ipv4", expr(s"size(regexp_extract_all(text, '${sq(Ipv4Re)}', 0))"))
      .withColumn("n_phones", expr(s"size(regexp_extract_all(text, '${sq(PhoneRe)}', 0))"))
      .withColumn("has_pii", expr("n_emails + n_ipv4 + n_phones > 0"))
      .withColumn("redacted", expr(
        s"""regexp_replace(
           |  regexp_replace(
           |    regexp_replace(text, '${sq(EmailRe)}', '[EMAIL]'),
           |    '${sq(Ipv4Re)}', '[IP]'),
           |  '${sq(PhoneRe)}', '[PHONE]')""".stripMargin))
      .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
        col("has_pii"), col("redacted"))

  private val FixtureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  def piiRedactQ(spark: SparkSession): DataFrame =
    piiRedact(spark.read.schema(FixtureSchema).json(s"$FixtureDir/*.jsonl"))
      .orderBy("doc_id")

  val piiRedactSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text
       |  FROM read_json('$FixtureDir/*.jsonl', format = 'newline_delimited',
       |                 columns = {doc_id: 'BIGINT', text: 'VARCHAR'})
       |)
       |SELECT doc_id,
       |       CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_emails,
       |       CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS INT) AS n_ipv4,
       |       CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phones,
       |       len(regexp_extract_all(text, '$EmailRe'))
       |         + len(regexp_extract_all(text, '$Ipv4Re'))
       |         + len(regexp_extract_all(text, '$PhoneRe')) > 0 AS has_pii,
       |       regexp_replace(
       |         regexp_replace(
       |           regexp_replace(text, '$EmailRe', '[EMAIL]', 'g'),
       |           '$Ipv4Re', '[IP]', 'g'),
       |         '$PhoneRe', '[PHONE]', 'g') AS redacted
       |FROM d
       |ORDER BY doc_id""".stripMargin
}
