package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Parity.rsql

/** Raw-file JSONL ingest (round 7) — the corpus interchange format a
  * training-data pipeline actually receives: newline-delimited JSON
  * documents with nested metadata and real-world dirt (syntactically
  * broken lines, records missing required fields). The document-corpus
  * analog of [[CsvIngest]]'s signal-file bronze entry point
  * (/root/reference/delta_bronze.py:17 reads raw drops the same way).
  *
  * Shape: EXPLICIT schema (at 100 TB schema inference is a full extra
  * pass over the data — never infer on an ingest path) + PERMISSIVE mode
  * with a corrupt-record column, so one broken line costs one row, not
  * the job; required-field nulls (a record without `text`) are filtered
  * explicitly alongside. The whole ingest is MAP-ONLY — files are the
  * parallelism unit, no shuffle, no inference pre-pass (spec-pinned:
  * zero exchanges, one scan).
  *
  * Oracle parity: DuckDB `read_json(format='newline_delimited',
  * ignore_errors=true)` drops exactly the syntactically-broken lines
  * Spark marks corrupt, and both engines agree on the missing-field
  * NULLs; doubles parse from identical literal text (IEEE
  * nearest-double on both sides), strings are ASCII in the committed
  * fixture. The fixture (fixtures/jsonl_docs, deterministic) plants one
  * invalid-JSON line and one missing-`text` record so both drop paths
  * are actually exercised.
  */
object JsonlIngest {

  /** Committed fixture dir — the staged "raw drop" both engines read. */
  val FixtureDir = "/root/repo/fixtures/jsonl_docs"

  /** Explicit ingest schema; `_corrupt` receives unparseable lines in
    * PERMISSIVE mode. */
  val IngestSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("meta", StructType(Seq(
      StructField("origin", StringType),
      StructField("quality", DoubleType)))),
    StructField("_corrupt", StringType)))

  private def parsed(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(IngestSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(s"$dir/*.jsonl")

  /** Clean ingested documents: parse, drop broken lines and records
    * missing required fields, flatten the nested metadata. */
  def jsonlIngest(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .filter(col("_corrupt").isNull && col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).as("n_chars"),
        col("meta.origin").as("origin"),
        col("meta.quality").as("quality"))

  /** Rejected-line audit for ingest attribution: (doc_id, raw line text)
    * for every line that failed to parse. `doc_id` is non-NULL ONLY for
    * partially-parseable records (a type mismatch in another field):
    * PERMISSIVE mode nulls EVERY data column when a line is syntactically
    * broken and only populates `_corrupt`, so the planted invalid-JSON
    * fixture line carries doc_id = NULL here — attribution for that case
    * is the raw line itself. Type-mismatch salvage is also outside the
    * DuckDB oracle's parity contract (`ignore_errors` drops the whole
    * line where Spark salvages fields), which is why the audit is
    * spec-gated, not oracled.
    * Referencing a real data column alongside `_corrupt` is what makes
    * this legal on the live scan — Spark refuses queries whose referenced
    * columns are ONLY the internal corrupt-record column — so the audit
    * stays a plain filtered scan, no materialization of the parsed corpus
    * (the round-7 review caught a localCheckpoint here that would have
    * stored every parsed partition to surface a handful of lines). */
  def jsonlCorrupt(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .filter(col("_corrupt").isNotNull)
      .select(col("doc_id"), col("_corrupt").as("raw_line"))

  def jsonlIngestQ(spark: SparkSession): DataFrame =
    jsonlIngest(spark, FixtureDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("origin"), Parity.r("quality", 4))
      .orderBy("doc_id")

  val jsonlIngestSql: String =
    s"""SELECT doc_id, text, lang, source,
       |       CAST(length(text) AS INT) AS n_chars,
       |       meta.origin AS origin,
       |       ${rsql("meta.quality", 4, "quality")}
       |FROM read_json('$FixtureDir/*.jsonl',
       |               format = 'newline_delimited',
       |               ignore_errors = true,
       |               columns = {doc_id: 'BIGINT', text: 'VARCHAR',
       |                          lang: 'VARCHAR', source: 'VARCHAR',
       |                          meta: 'STRUCT(origin VARCHAR, quality DOUBLE)'})
       |WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |ORDER BY doc_id""".stripMargin
}
