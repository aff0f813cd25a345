package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split REPAIR (round 8, continuation) — [[SplitLeakage]] audits
  * cross-split near-duplicate leakage; this op FIXES it: every member of
  * a near-dup cluster ([[Dedup.dedupClusters]]) is reassigned to its
  * cluster CANONICAL's split, so no cluster straddles train/val/test
  * after repair. Exact duplicates can't leak by construction
  * ([[TextOps.corpusSplit]] keys on the content fingerprint); near-dups
  * can, and moving whole clusters to the canonical's split is the
  * deterministic, content-stable repair (the canonical's split is itself
  * fingerprint-keyed, so re-ingest reproduces the repaired assignment).
  *
  * Output: per doc, old/new split and the moved verdict — an audit
  * trail, not a silent rewrite; `moved` rows are exactly the leakage the
  * audit would have flagged at the cluster level.
  *
  * Scale shape: cluster labels come from [[Dedup.dedupClustersLsh]] (the
  * shipping Σ bucket² pair path, row-identical to the exact form on the
  * gate corpus — the #39 argument that keeps the exact closure chain as
  * the oracle) and are localCheckpoint'd (the CC loop is the expensive
  * upstream; the label frame feeds the member join AND the
  * canonical-split join). The split assignment is a pure fused map pass
  * recomputed per consumer BY DESIGN (the [[Curation.qualitySelect]]
  * two-pass exception — materializing the corpus to save two md5s per
  * row is the wrong trade); both joins are doc_id/cluster_id-keyed hash
  * joins. Oracle composes the SAME closure chain and split fragment
  * texts the source operators use (one-text rule).
  */
object SplitRepair {

  def splitRepair(documents: DataFrame): DataFrame = {
    val clusters = Dedup.dedupClustersLsh(documents)
      .select("doc_id", "cluster_id")
      .localCheckpoint()
    val splits = TextOps.corpusSplit(documents).select("doc_id", "split")
    val canonical = splits
      .select(col("doc_id").as("cluster_id"), col("split").as("new_split"))
    clusters
      .join(splits, Seq("doc_id"))
      .withColumnRenamed("split", "old_split")
      .join(canonical, Seq("cluster_id"))
      .withColumn("moved", col("old_split") =!= col("new_split"))
      .select(col("doc_id"), col("cluster_id"), col("old_split"),
        col("new_split"), col("moved"))
  }

  def splitRepairQ(documents: DataFrame): DataFrame =
    splitRepair(documents).orderBy("doc_id")

  val splitRepairSql: String = {
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
       |), ${TextOps.corpusSplitBodySql}
       |SELECT cc.doc AS doc_id, cc.cluster_id,
       |       so.split AS old_split, sn.split AS new_split,
       |       so.split <> sn.split AS moved
       |FROM cc JOIN sp so ON so.doc_id = cc.doc
       |        JOIN sp sn ON sn.doc_id = cc.cluster_id
       |ORDER BY cc.doc""".stripMargin
  }
}
