package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DUPLICATION TOPOLOGY report (round 8, continuation) — the degree
  * distribution of the near-dup pair graph: how many docs are isolated
  * (degree 0), paired, or sitting in dense duplicate stars. The dedup
  * family FINDS pairs and clusters; this one-page histogram is what an
  * operator reads to pick the dials — a heavy tail means hot-key
  * salting and maxDf cuts matter ([[Skew.saltedJoinHot]],
  * [[Dedup.hotShingles]]); a near-all-isolated corpus means the LSH
  * stage is already cheap. [[KeySkew.keySkewReport]] diagnoses one join
  * key's skew; this diagnoses the pair GRAPH's shape.
  *
  * §6: degrees are BIGINT pair counts over the verified (jaccard ≥ τ)
  * pair set — the same exactly-verified pairs dedup_minhash_lsh ships
  * (oracle nests Lsh.exactPairCtes verbatim, one-text rule); histogram
  * shares are integer ppm; degree-0 docs enter via the doc-spine left
  * join — total.
  *
  * Scale shape: the pair miner's own shapes, then a pair-touch union
  * (2·|pairs| narrow rows), a doc-keyed count, a degree-keyed histogram
  * (≤ max-degree rows) and the 1-row total on the documented broadcast
  * fact. Nothing new scales with corpus size beyond the miner itself.
  */
object DedupDegree {

  def dedupDegree(documents: DataFrame): DataFrame = {
    val pairs = Lsh.minhashLshPairs(documents).select("id1", "id2")
    val touch = pairs.select(col("id1").as("doc_id"))
      .unionAll(pairs.select(col("id2").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("deg"))
    val hist = documents.select("doc_id")
      .join(touch, Seq("doc_id"), "left")
      .withColumn("degree", coalesce(col("deg"), lit(0L)))
      .groupBy("degree").agg(count(lit(1)).as("n_docs"))
    val tot = hist.agg(coalesce(sum("n_docs"), lit(0L)).as("total"))
    hist.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n_docs * 1000000 div greatest(total, 1)"))
      .select(col("degree"), col("n_docs"), col("share_ppm"))
      .orderBy("degree")
  }

  def dedupDegreeQ(documents: DataFrame): DataFrame =
    dedupDegree(documents)

  val dedupDegreeSql: String =
    s"""WITH ${Lsh.exactPairCtes}, p AS (
       |  SELECT id1, id2 FROM j WHERE jaccard >= ${Dedup.JaccardThreshold}
       |), t AS (
       |  SELECT id1 AS doc_id FROM p UNION ALL SELECT id2 FROM p
       |), degs AS (
       |  SELECT d.doc_id, CAST(COALESCE(c.deg, 0) AS BIGINT) AS degree
       |  FROM documents d
       |  LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS deg
       |             FROM t GROUP BY 1) c ON c.doc_id = d.doc_id
       |), hist AS (
       |  SELECT degree, CAST(count(*) AS BIGINT) AS n_docs FROM degs GROUP BY 1
       |), tot AS (
       |  SELECT CAST(COALESCE(sum(n_docs), 0) AS BIGINT) AS total FROM hist
       |)
       |SELECT degree, n_docs,
       |       n_docs * 1000000 // greatest(total, 1) AS share_ppm
       |FROM hist CROSS JOIN tot
       |ORDER BY degree""".stripMargin
}
