package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SOURCE DUPLICATION RATE (round 8, continuation 5) — which sources
  * are copying themselves (or each other): per source, how many docs
  * have at least one verified near-dup anywhere in the corpus, split
  * into WITHIN-source and CROSS-source partners. [[DedupDegree]] is
  * the global topology histogram; this attributes the dup mass to the
  * mixture's own axis — the readout that demotes a self-plagiarizing
  * crawl slice in [[MixturePlan]] before [[DedupWeights]] discounts
  * survivors. Pairs come from the SHIPPING LSH path ([[DedupDegree]]'s
  * row-identity argument keeps the exact miner as the oracle's route).
  *
  * Cross-engine exactness (SURVEY §6): exact doc counts off the
  * distinct touched-doc sets; ppm with the greatest-1 guard; a doc
  * with both within- and cross-source partners counts in BOTH columns
  * (they answer different questions) but once in `n_dup_docs`.
  *
  * Scale shape: the pair miner dominates (its dials apply); everything
  * after is pair-stream-sized — two source lookups against the thin
  * doc spine (doc-keyed hash joins of collapsed frames), distinct per
  * (doc, kind), catalog-sized rollup joined to per-source totals.
  */
object SourceDupRate {

  def sourceDupRate(documents: DataFrame): DataFrame =
    rateOverPairs(documents, Lsh.minhashLshPairs(documents).select("id1", "id2"))

  /** The attribution fed from a persisted [[Dedup.pairIndex]]: verified
    * pairs become a map+filter over the stored stats (round-12 mine-once
    * economics). Row-identical to the shipping LSH form wherever LSH
    * recall is 1 — the operator's own oracle already rides that
    * equivalence ([[DedupDegree]] precedent); InfraSpec pins it. */
  def sourceDupRateFromIndex(documents: DataFrame, index: DataFrame): DataFrame =
    rateOverPairs(documents,
      Dedup.pairsFromIndex(index).select("id1", "id2"))

  private def rateOverPairs(documents: DataFrame,
                            verified: DataFrame): DataFrame = {
    val spine = documents.select(col("doc_id"), col("source"))
    val pairs = verified
      .join(spine.select(col("doc_id").as("id1"), col("source").as("s1")), Seq("id1"))
      .join(spine.select(col("doc_id").as("id2"), col("source").as("s2")), Seq("id2"))
    val touched = pairs.select(col("id1").as("doc_id"), col("s1").as("source"),
        (col("s1") === col("s2")).as("within"))
      .unionAll(pairs.select(col("id2").as("doc_id"), col("s2").as("source"),
        (col("s1") === col("s2")).as("within")))
      .distinct()
    val perSource = touched.groupBy("source")
      .agg(countDistinct("doc_id").as("n_dup_docs"),
        countDistinct(when(col("within"), col("doc_id"))).as("n_within"),
        countDistinct(when(!col("within"), col("doc_id"))).as("n_cross"))
    documents.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(perSource, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        coalesce(col("n_within"), lit(0L)).as("n_within"),
        coalesce(col("n_cross"), lit(0L)).as("n_cross"),
        expr("coalesce(n_dup_docs, 0) * 1000000 div greatest(n_docs, 1)")
          .as("dup_ppm"))
  }

  def sourceDupRateQ(documents: DataFrame): DataFrame =
    sourceDupRate(documents).orderBy("source")

  /** Oracle rides [[Lsh.exactPairCtes]] (the LSH≡exact row-identity
    * argument, [[DedupDegree]]'s precedent). */
  val sourceDupRateSql: String =
    s"""WITH ${Lsh.exactPairCtes}, vp AS (
       |  SELECT id1, id2 FROM j WHERE jaccard >= ${Dedup.JaccardThreshold}
       |), lab AS (
       |  SELECT v.id1, v.id2, d1.source AS s1, d2.source AS s2
       |  FROM vp v
       |  JOIN documents d1 ON d1.doc_id = v.id1
       |  JOIN documents d2 ON d2.doc_id = v.id2
       |), touched AS (
       |  SELECT DISTINCT doc_id, source, within FROM (
       |    SELECT id1 AS doc_id, s1 AS source, s1 = s2 AS within FROM lab
       |    UNION ALL
       |    SELECT id2, s2, s1 = s2 FROM lab
       |  )
       |), per_source AS (
       |  SELECT source,
       |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_dup_docs,
       |         CAST(count(DISTINCT CASE WHEN within THEN doc_id END) AS BIGINT) AS n_within,
       |         CAST(count(DISTINCT CASE WHEN NOT within THEN doc_id END) AS BIGINT) AS n_cross
       |  FROM touched GROUP BY 1
       |), totals AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1
       |)
       |SELECT t.source, t.n_docs,
       |       COALESCE(p.n_dup_docs, 0) AS n_dup_docs,
       |       COALESCE(p.n_within, 0) AS n_within,
       |       COALESCE(p.n_cross, 0) AS n_cross,
       |       COALESCE(p.n_dup_docs, 0) * 1000000 // greatest(t.n_docs, 1) AS dup_ppm
       |FROM totals t LEFT JOIN per_source p ON p.source = t.source
       |ORDER BY t.source""".stripMargin
}
