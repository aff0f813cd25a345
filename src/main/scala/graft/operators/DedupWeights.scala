package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SOFT-dedup sampling weights (round 8, continuation) — instead of
  * dropping near-duplicate cluster members ([[Dedup.dedupClusters]]'
  * keep/drop verdict), down-weight them: every member of a size-s
  * cluster gets sampling weight 1/s, so the cluster contributes ONE
  * document's worth of probability mass however many copies exist. The
  * standard alternative when a trainer wants repetition-corrected
  * sampling without discarding variant copies (each near-dup may carry
  * unique spans a hard drop would lose) — the loss-weighting twin of
  * [[MixturePlan]]'s replication side.
  *
  * Cross-engine exactness (§6): the weight is integer ppm
  * (`10⁶ div s`) — no float division; a downstream sampler multiplies
  * counts, it never needs the unquantized ratio.
  *
  * Scale shape: cluster labels come from [[Dedup.dedupClustersLsh]] —
  * the shipping-scale pair path (Σ bucket², not Σ df²), row-identical to
  * the exact form on the gate corpus (the #39 spec-pinned argument that
  * lets the exact recursive-CTE closure stay the oracle); the label
  * frame (≤|docs| narrow rows) is localCheckpoint'd — it feeds the size
  * aggregation AND the join-back (multi-consumer invariant, and the CC
  * loop upstream is the expensive thing the checkpoint must not re-run);
  * the size frame is ≤|clusters| rows and the join is cluster_id-keyed.
  */
object DedupWeights {

  def dedupWeights(documents: DataFrame): DataFrame = {
    val clusters = Dedup.dedupClustersLsh(documents)
      .select("doc_id", "cluster_id")
      .localCheckpoint()
    val sizes = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    clusters.join(sizes, Seq("cluster_id"))
      .withColumn("weight_ppm", expr("1000000 div cluster_size"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("weight_ppm"))
  }

  def dedupWeightsQ(documents: DataFrame): DataFrame =
    dedupWeights(documents).orderBy("doc_id")

  /** Extends [[Dedup.dedupClustersSql]]'s recursive-CTE closure with the
    * size rollup — the cluster definition cannot drift between the
    * keep/drop and the weighting contract. */
  val dedupWeightsSql: String = {
    val pairsCte = Dedup.ngramJaccardSqlBody
    s"""WITH RECURSIVE $pairsCte, edges AS (
       |  SELECT id1 AS u, id2 AS v FROM jpairs
       |  UNION ALL
       |  SELECT id2 AS u, id1 AS v FROM jpairs
       |), reach AS (
       |  SELECT doc_id AS doc, doc_id AS r FROM documents
       |  UNION
       |  SELECT e.u AS doc, reach.r FROM edges e JOIN reach ON reach.doc = e.v
       |), cc AS (
       |  SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc
       |), sizes AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM cc GROUP BY 1
       |)
       |SELECT cc.doc AS doc_id, cc.cluster_id, s.cluster_size,
       |       1000000 // s.cluster_size AS weight_ppm
       |FROM cc JOIN sizes s ON s.cluster_id = cc.cluster_id
       |ORDER BY cc.doc""".stripMargin
  }
}
