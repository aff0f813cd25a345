package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PARTITION-COLUMN ADVISOR (round 13) — the table-layout dial the lake
  * maintenance family decides BEFORE the others apply: [[ZOrder]]
  * clusters within files, [[CompactionPlan]] bins them, [[VacuumPlan]]
  * retires them; this picks WHICH column partitions the table at all.
  * For each candidate partitioning of `documents` — `lang`, `source`,
  * `(lang, source)`, and the [[KAnonymity.BucketExpr]] length bucket —
  * report the two layout killers and recommend the cost argmin:
  *
  *  - HOT-PARTITION ceiling `max_share_ppm` (largest partition's row
  *    share): the scan-parallelism bound — a 90% partition means
  *    partition pruning saves nothing and one task does the work;
  *  - SMALL-FILE share `small_share_ppm` (partitions under ¼ of the
  *    average byte mass, cross-multiplied integers — scale-free, so
  *    the report is non-degenerate at every SF): the metadata/open-cost
  *    explosion a too-fine column causes.
  *
  * `est_cost = max_share_ppm + small_share_ppm`, both in ppm — one
  * transparent unit; ties prefer MORE partitions (parallelism), then
  * name. All four candidate censuses come from ONE Expand pass
  * (GROUPING SETS — the [[GroupingSetsAgg]] plan class put to work:
  * one corpus scan, 4 replicas, map-side partials), distinguished by
  * the ANSI grouping bitmask in one shared CASE text.
  *
  * §6: all integers; shares are `x·10⁶ div total`; the small test is
  * `bytes·4·n_partitions < total_bytes` (no division). Scale: the one
  * data-volume stage is the Expand census; the census frame is
  * |distinct values|-sized, checkpointed (2 consumers: per-candidate
  * totals + the small-partition probe join), and everything after is
  * catalog-sized. */
object PartitionPlan {

  /** Shared candidate-name text: the CASE over the (lang, source,
    * len_bucket) grouping bitmask. */
  private val CandExpr =
    """CASE gid WHEN 3 THEN 'lang' WHEN 5 THEN 'source'
      |         WHEN 1 THEN 'lang_source' WHEN 6 THEN 'len_bucket' END""".stripMargin

  def partitionPlan(documents: DataFrame): DataFrame = {
    val census = documents
      .select(col("lang"), col("source"),
        expr(KAnonymity.BucketExpr).as("len_bucket"),
        col("n_chars"))
      .groupingSets(
        Seq(Seq(col("lang")), Seq(col("source")),
          Seq(col("lang"), col("source")), Seq(col("len_bucket"))),
        col("lang"), col("source"), col("len_bucket"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_rows"), sum("n_chars").as("bytes"))
      .select(expr(CandExpr).as("candidate"), col("n_rows"), col("bytes"))
      .localCheckpoint() // 2 consumers: totals + the small-partition probe
    val totals = census.groupBy("candidate")
      .agg(count(lit(1)).as("n_partitions"),
        sum("n_rows").as("total_rows"),
        max("n_rows").as("max_rows"),
        sum("bytes").as("total_bytes"))
    val small = census.join(broadcast(totals), Seq("candidate"))
      .filter(expr("bytes * 4 * n_partitions < total_bytes"))
      .groupBy("candidate").agg(count(lit(1)).as("n_small"))
    val scoredW = org.apache.spark.sql.expressions.Window
      .orderBy(col("est_cost"), col("n_partitions").desc, col("candidate"))
    totals.join(small, Seq("candidate"), "left")
      .select(col("candidate"), col("n_partitions"), col("total_rows"),
        col("max_rows"),
        expr("max_rows * 1000000 div total_rows").as("max_share_ppm"),
        coalesce(col("n_small"), lit(0L)).as("n_small"),
        expr("coalesce(n_small, 0L) * 1000000 div n_partitions").as("small_share_ppm"))
      .withColumn("est_cost", expr("max_share_ppm + small_share_ppm"))
      .withColumn("recommended",
        when(row_number().over(scoredW) === 1, 1L).otherwise(0L))
  }

  def partitionPlanQ(documents: DataFrame): DataFrame =
    partitionPlan(documents).orderBy("candidate")

  val partitionPlanSql: String =
    s"""WITH census AS (
       |  SELECT $CandExpr AS candidate, n_rows, bytes
       |  FROM (
       |    SELECT CAST(GROUPING(lang, source, len_bucket) AS BIGINT) AS gid,
       |           CAST(count(*) AS BIGINT) AS n_rows,
       |           CAST(sum(n_chars) AS BIGINT) AS bytes
       |    FROM (SELECT lang, source, ${KAnonymity.BucketExpr} AS len_bucket, n_chars
       |          FROM documents)
       |    GROUP BY GROUPING SETS ((lang), (source), (lang, source), (len_bucket))
       |  )
       |), totals AS (
       |  SELECT candidate,
       |         CAST(count(*) AS BIGINT) AS n_partitions,
       |         CAST(sum(n_rows) AS BIGINT) AS total_rows,
       |         CAST(max(n_rows) AS BIGINT) AS max_rows,
       |         CAST(sum(bytes) AS BIGINT) AS total_bytes
       |  FROM census GROUP BY 1
       |), small AS (
       |  SELECT c.candidate, CAST(count(*) AS BIGINT) AS n_small
       |  FROM census c JOIN totals t ON c.candidate = t.candidate
       |  WHERE c.bytes * 4 * t.n_partitions < t.total_bytes
       |  GROUP BY 1
       |), scored AS (
       |  SELECT t.candidate, t.n_partitions, t.total_rows, t.max_rows,
       |         t.max_rows * 1000000 // t.total_rows AS max_share_ppm,
       |         COALESCE(s.n_small, 0) AS n_small,
       |         COALESCE(s.n_small, 0) * 1000000 // t.n_partitions AS small_share_ppm,
       |         t.max_rows * 1000000 // t.total_rows
       |           + COALESCE(s.n_small, 0) * 1000000 // t.n_partitions AS est_cost
       |  FROM totals t LEFT JOIN small s ON t.candidate = s.candidate
       |)
       |SELECT candidate, n_partitions, total_rows, max_rows, max_share_ppm,
       |       n_small, small_share_ppm, est_cost,
       |       CAST(CASE WHEN row_number() OVER (ORDER BY est_cost, n_partitions DESC,
       |              candidate) = 1 THEN 1 ELSE 0 END AS BIGINT) AS recommended
       |FROM scored
       |ORDER BY candidate""".stripMargin
}
