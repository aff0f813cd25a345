package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Cross-SOURCE overlap matrix (round 8) — dataset-granularity dedup
  * pressure: exact word-bigram-shingle Jaccard between every source pair
  * ([[Dedup]]'s shingle convention, so "overlap" here means the same thing
  * the near-dup family measures per document). This is the corpus-health
  * number a mixture designer reads before weighting sources — two mirrors
  * of the same crawl score near 1 and should not be double-weighted — and
  * the coarse pre-filter that tells the doc-level dedup where to look.
  *
  * Scale shape: the unit of candidate generation is the DISTINCT
  * (source, shingle) pair — one distinct-exchange collapses each source's
  * token stream to its shingle SET, and the shingle-keyed self-join then
  * costs Σ_s k(s)² where k(s) ≤ |sources| (number of sources containing
  * the shingle) — bounded by |sources|²·|vocab|, NOT by corpus row count,
  * because per-source multiplicity is already gone. A shingle present in
  * every source is the hot key (k² rows on one reducer); with thousands of
  * sources the [[Dedup]] hot-key treatments (df cap, salted join) apply
  * unchanged. The pair frame (|sources|² rows) and size frame (|sources|
  * rows) are catalog-sized — broadcast-safe at any corpus volume, which is
  * why `broadcast` here is a fact, not a dial. Zero-intersection pairs are
  * kept (LEFT join + coalesce 0): the full matrix is the report.
  */
object SourceOverlap {

  /** Distinct (source, shingle): shingle expression INLINE at the
    * generator (the §invariants explode rule — shared text with
    * [[Dedup.shingleExploded]] so the two definitions cannot drift).
    * Shared with [[SourceRank]], whose edge weights are these pairs. */
  private[operators] def sourceShingles(documents: DataFrame): DataFrame =
    documents
      .select(col("source"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
      .select(col("source"), explode(expr(Dedup.ShingleArrayExpr)).as("shingle"))
      .distinct()

  def sourceOverlap(documents: DataFrame): DataFrame = {
    // three consumers (sizes + both self-join sides) — checkpoint or
    // Catalyst re-plans the scan+explode+distinct per consumer (§invariants)
    val ss = sourceShingles(documents).localCheckpoint()
    val sizes = ss.groupBy("source").agg(count("*").as("n"))
    val inter = ss.as("a").join(ss.as("b"), Seq("shingle"))
      .where(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count("*").as("n_inter"))
    val pairs = broadcast(sizes.select(col("source").as("source_a"), col("n").as("n_a")))
      .crossJoin(broadcast(sizes.select(col("source").as("source_b"), col("n").as("n_b"))))
      .where(col("source_a") < col("source_b"))
    pairs.join(inter, Seq("source_a", "source_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("jaccard",
        expr("""CASE WHEN n_a + n_b - n_inter = 0 THEN CAST(0.0 AS DOUBLE)
               |ELSE CAST(n_inter AS DOUBLE) / CAST(n_a + n_b - n_inter AS DOUBLE) END""".stripMargin))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_inter"), r("jaccard", 6))
  }

  def sourceOverlapQ(documents: DataFrame): DataFrame =
    sourceOverlap(documents).orderBy("source_a", "source_b")

  val sourceOverlapSql: String =
    s"""WITH toks AS (
       |  SELECT source, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
       |), sh AS (
       |  SELECT source,
       |         list_distinct([w[i] || ' ' || w[i + 1] for i in range(1, len(w))]) AS shingles
       |  FROM toks
       |), ss AS (
       |  SELECT DISTINCT source, shingle
       |  FROM (SELECT source, unnest(shingles) AS shingle FROM sh)
       |), sizes AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM ss GROUP BY source
       |), inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |         CAST(count(*) AS BIGINT) AS n_inter
       |  FROM ss a JOIN ss b ON a.shingle = b.shingle AND a.source < b.source
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT sa.source AS source_a, sb.source AS source_b,
       |         sa.n AS n_a, sb.n AS n_b
       |  FROM sizes sa JOIN sizes sb ON sa.source < sb.source
       |)
       |SELECT p.source_a, p.source_b, p.n_a, p.n_b,
       |       COALESCE(i.n_inter, 0) AS n_inter,
       |       ${rsql(
      """CASE WHEN p.n_a + p.n_b - COALESCE(i.n_inter, 0) = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE CAST(COALESCE(i.n_inter, 0) AS DOUBLE) / CAST(p.n_a + p.n_b - COALESCE(i.n_inter, 0) AS DOUBLE) END""".stripMargin, 6, "jaccard")}
       |FROM pairs p
       |LEFT JOIN inter i ON i.source_a = p.source_a AND i.source_b = p.source_b
       |ORDER BY p.source_a, p.source_b""".stripMargin
}
