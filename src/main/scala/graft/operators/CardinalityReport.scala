package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Cardinality report (round 8, continuation) — the per-source DISTINCT
  * inventory [[Curation.corpusReport]]'s count/mass rollup doesn't carry:
  * distinct tokens (live vocabulary), distinct content fingerprints
  * (unique documents after exact-dedup normalization), and the derived
  * type-token ratio / duplication factor — the two numbers that tell a
  * mixture designer whether a source is linguistically rich or a
  * boilerplate mill BEFORE committing weight to it.
  *
  * The registered contract is EXACT distinct counts (shuffle on
  * (source, key) with partial aggregation — correct at any scale, one
  * exchange per distinct dimension). The 100 TB fast path is the HLL
  * sketch (`approx_count_distinct`, one pass, no second shuffle,
  * mergeable across shards): engine-internal hashing means it can never
  * be oracled, so it ships as a SPEC-measured alternative —
  * CardinalitySpec bounds its relative error against the exact counts
  * at gate scale (rsd ≤ 5% configured, observed well inside), which is
  * the measurement a deployment needs to choose the sketch.
  *
  * Exactness: all-integer counts; the two ratios are single Parity
  * cast-divides (§6).
  */
object CardinalityReport {

  def cardinalityReport(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("source"),
        explode(expr(
          "filter(coalesce(split(lower(trim(text)), '\\\\s+'), array()), t -> t != '')"))
          .as("tok"))
    val tokAgg = toks.groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_distinct_tokens"))
    val docAgg = documents
      .withColumn("fp",
        expr("md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_distinct_docs"))
    docAgg.join(tokAgg, Seq("source"), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("n_distinct_tokens", coalesce(col("n_distinct_tokens"), lit(0L)))
      .withColumn("type_token_ratio",
        expr("CAST(n_distinct_tokens AS DOUBLE) / greatest(n_tokens, 1)"))
      .withColumn("dup_factor",
        expr("CAST(n_docs AS DOUBLE) / greatest(n_distinct_docs, 1)"))
      .select(col("source"), col("n_docs"), col("n_distinct_docs"),
        col("n_tokens"), col("n_distinct_tokens"),
        r("type_token_ratio", 6), r("dup_factor", 6))
  }

  /** The sketch path: same report shape with HLL distincts (rsd = the
    * accuracy dial). Spec-measured, never oracled. */
  def cardinalityReportApprox(documents: DataFrame, rsd: Double = 0.05): DataFrame = {
    val toks = documents
      .select(col("source"),
        explode(expr(
          "filter(coalesce(split(lower(trim(text)), '\\\\s+'), array()), t -> t != '')"))
          .as("tok"))
    val tokAgg = toks.groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        approx_count_distinct(col("tok"), rsd).as("n_distinct_tokens"))
    val docAgg = documents
      .withColumn("fp",
        expr("md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), approx_count_distinct(col("fp"), rsd).as("n_distinct_docs"))
    docAgg.join(tokAgg, Seq("source"), "left")
  }

  def cardinalityReportQ(documents: DataFrame): DataFrame =
    cardinalityReport(documents).orderBy("source")

  val cardinalityReportSql: String =
    s"""WITH toks AS (
       |  SELECT source,
       |         unnest(list_filter(COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []),
       |                            t -> t != '')) AS tok
       |  FROM documents
       |), ta AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       |         CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
       |  FROM toks GROUP BY 1
       |), da AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(count(DISTINCT md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))))) AS BIGINT) AS n_distinct_docs
       |  FROM documents GROUP BY 1
       |), j AS (
       |  SELECT da.source, n_docs, n_distinct_docs,
       |         COALESCE(n_tokens, 0) AS n_tokens,
       |         COALESCE(n_distinct_tokens, 0) AS n_distinct_tokens
       |  FROM da LEFT JOIN ta ON da.source = ta.source
       |)
       |SELECT source, n_docs, n_distinct_docs, n_tokens, n_distinct_tokens,
       |       ${rsql("(CAST(n_distinct_tokens AS DOUBLE) / greatest(n_tokens, 1))", 6, "type_token_ratio")},
       |       ${rsql("(CAST(n_docs AS DOUBLE) / greatest(n_distinct_docs, 1))", 6, "dup_factor")}
       |FROM j
       |ORDER BY source""".stripMargin
}
