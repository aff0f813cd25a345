package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary COVERAGE curve (round 8) — the tokenizer-sizing signal read
  * next to [[Vocab.vocabBuild]]'s raw inventory: for each candidate
  * vocabulary capacity K, the fraction of the corpus' total token mass
  * covered by the top-K unigrams (rank = tf DESC, term — vocabBuild's
  * total order). `1 − coverage` is the OOV/UNK rate a K-entry
  * closed-vocabulary tokenizer would pay on this corpus, which is the
  * number that decides K before [[TokenizeIds]] commits to a mapping.
  *
  * All-integer until the single display division (§6): covered/total
  * masses are exact BIGINT sums; `coverage` is ONE cast-then-divide,
  * Parity-rounded. The K list is compiled from ONE Scala Seq into both
  * engines' text (the [[Sampling]] one-map rule), so the curve points
  * cannot drift between Spark and DuckDB.
  *
  * Scale shape: one inline-generator unigram explode → one
  * map-side-combinable term agg (vocab-sized output). That term frame
  * genuinely feeds TWO consumers — the totals aggregate and the top-K —
  * so it is localCheckpoint'd per the multi-consumer invariant
  * ([[Collocations]]' unigram frame argument). Top-K is
  * `orderBy().limit(maxK)` → TakeOrderedAndProject (per-partition partial
  * top-K, never a global sort — vocabBuild's spec-pinned shape); the rank
  * window and the per-K conditional sums touch only the maxK-row frame,
  * and the totals row joins back as a 1-row broadcast. Output is |Ks|
  * rows at any corpus size. Empty corpus → zero rows (total-mass filter),
  * keeping the operator total.
  */
object VocabCoverage {

  /** Candidate vocabulary capacities — the curve's x axis. */
  val CoverageKs: Seq[Int] = Seq(10, 100, 1000)

  def vocabCoverage(documents: DataFrame,
                    ks: Seq[Int] = CoverageKs): DataFrame = {
    val maxK = ks.max
    val tf = documents
      .select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
      .select(explode(col("w")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val totals = tf.agg(sum("tf").as("total_tf"), count(lit(1)).as("n_terms"))
    val ranked = tf.orderBy(col("tf").desc, col("term")).limit(maxK)
      .withColumn("rank", row_number().over(Window.orderBy(col("tf").desc, col("term"))))
    val covCols = ks.map(k =>
      coalesce(sum(when(col("rank") <= k, col("tf"))), lit(0L)).as(s"c_$k"))
    val covered = ranked.agg(covCols.head, covCols.tail: _*)
    val stackArgs = ks.map(k => s"CAST($k AS BIGINT), c_$k").mkString(", ")
    covered
      .select(expr(s"stack(${ks.length}, $stackArgs) AS (top_k, covered_tf)"))
      .crossJoin(broadcast(totals))
      .filter(col("total_tf") > 0)
      .withColumn("coverage",
        expr("CAST(covered_tf AS DOUBLE) / CAST(total_tf AS DOUBLE)"))
      .select(col("top_k"), col("covered_tf"), col("n_terms"), col("total_tf"),
        Parity.r("coverage", 6))
  }

  def vocabCoverageQ(documents: DataFrame): DataFrame =
    vocabCoverage(documents).orderBy("top_k")

  val vocabCoverageSql: String = {
    val maxK = CoverageKs.max
    val unions = CoverageKs.map { k =>
      s"""  SELECT CAST($k AS BIGINT) AS top_k,
         |         COALESCE(CAST(sum(CASE WHEN rank <= $k THEN tf END) AS BIGINT), 0) AS covered_tf
         |  FROM ranked WHERE rank <= $maxK""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), tf AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT unnest(w) AS term FROM toks)
       |  GROUP BY term
       |), totals AS (
       |  SELECT CAST(sum(tf) AS BIGINT) AS total_tf,
       |         CAST(count(*) AS BIGINT) AS n_terms
       |  FROM tf
       |), ranked AS (
       |  SELECT tf, row_number() OVER (ORDER BY tf DESC, term) AS rank
       |  FROM tf
       |), cov AS (
       |$unions
       |)
       |SELECT top_k, covered_tf, n_terms, total_tf,
       |       ${Parity.rsql("CAST(covered_tf AS DOUBLE) / CAST(total_tf AS DOUBLE)", 6, "coverage")}
       |FROM cov, totals
       |WHERE total_tf > 0
       |ORDER BY top_k""".stripMargin
  }
}
