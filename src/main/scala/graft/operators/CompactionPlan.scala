package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** COMPACTION PLAN (round 10) — the OPTIMIZE bin-packing planner that
  * completes the lake-maintenance family ([[VacuumPlan]] says what to
  * delete, [[ZOrder]] says how to cluster, the CommitLog's compact()
  * executes a rewrite; nothing yet PLANS which inputs coalesce into
  * which output files): assign [[ShardManifest]] shards, in shard
  * order, to output file groups of ~equal token mass — group =
  * `cum_before div target`, the [[Curation.tokenBudgetPack]] integer
  * prefix-sum algebra at SHARD granularity, with the target derived
  * from the data (`total div 8`, the salting_plan pattern) so the plan
  * is non-degenerate at every scale.
  *
  * Scale shape: the manifest's one fused map pass + shard-keyed agg is
  * the only data-volume stage; the plan itself is a 16^digits-row frame
  * — its unpartitioned cumulative window is the documented tiny-frame
  * class (equidepth's boundary precedent), and the 1-row total rides
  * the broadcast-fact cross join. Manifest localCheckpoint'd (window +
  * total — two consumers).
  *
  * §6: all masses BIGINT; `div` on non-negative operands; deterministic
  * shard order. Oracle nests shardManifestSql verbatim (one-text rule).
  */
object CompactionPlan {

  val Groups = 8

  def compactionPlan(documents: DataFrame, groups: Int = Groups): DataFrame = {
    val m = ShardManifest.shardManifest(documents)
      .select("shard", "n_docs", "n_tokens")
      .localCheckpoint()
    val tot = m.agg(coalesce(sum("n_tokens"), lit(0L)).as("total_tokens"))
    val w = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    m.withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr(s"greatest(total_tokens div $groups, 1)"))
      .withColumn("file_group", expr("cum_before div target_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("cum_before"), col("target_tokens"), col("file_group"))
      .orderBy("shard")
  }

  def compactionPlanQ(documents: DataFrame): DataFrame =
    compactionPlan(documents)

  val compactionPlanSql: String = {
    val manifest = ShardManifest.shardManifestSql.replace("ORDER BY shard", "")
    s"""WITH m AS (
       |$manifest
       |), c AS (
       |  SELECT shard, n_docs, n_tokens,
       |         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY shard
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM m
       |), t AS (
       |  SELECT CAST(COALESCE(sum(n_tokens), 0) AS BIGINT) AS total_tokens FROM m
       |)
       |SELECT shard, n_docs, n_tokens, cum_before,
       |       greatest(total_tokens // $Groups, 1) AS target_tokens,
       |       cum_before // greatest(total_tokens // $Groups, 1) AS file_group
       |FROM c CROSS JOIN t
       |ORDER BY shard""".stripMargin
  }
}
