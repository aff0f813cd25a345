package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ZONE-MAP PRUNE AUDIT (round 8, continuation 5) — the consumer of
  * [[ZOrder.zorderPlan]]'s zone maps: for a panel of probe predicates
  * (user-range × day-range shapes a dashboard actually issues), how
  * many buckets the maps prune, how many rows the surviving buckets
  * scan, and how many of those rows actually match — the
  * scan-efficiency number that JUSTIFIES a z-order rewrite (zorder_plan
  * proposes the layout; this prices it). `waste_ppm` is the fraction
  * of scanned rows a pruned scan still wastes — 0 would be a perfect
  * layout, ~1e6 means the maps bought nothing for that predicate.
  *
  * The probe panel derives from the corpus' own min/max stats (an
  * eighth-span user slice, a trailing day window, a center cell, a
  * single-user point lookup) so the audit is scale-invariant and total
  * on any input — probes are DATA, not config.
  *
  * Cross-engine exactness (SURVEY §6): all bounds are integer div
  * arithmetic off the 1-row stats fact; counts exact BIGINT; waste is
  * integer ppm with non-negative operands (zone maps guarantee
  * rows_matched ≤ rows_scanned — every matching row lives in an
  * overlapping bucket; spec-pinned).
  *
  * Scale shape: the (user_id, day) projection is localCheckpoint'd —
  * THREE consumers (stats, the zone build, the exact matched count;
  * §invariants rule). Probes are 4 rows off the stats agg, also
  * checkpointed (2 consumers). The two BroadcastNestedLoopJoins are
  * the documented probe-fact class: |zones|×4 and |corpus|×4 with the
  * range residual — a 4-row broadcast against the scan, the
  * [[RefIntegrity]]/1-row-fact precedent, NOT a data×data product.
  */
object ZoneMapPrune {

  private def probesFrame(base: DataFrame): DataFrame =
    base.agg(min("user_id").as("lo_u"), max("user_id").as("hi_u"),
        min("day").as("lo_d"), max("day").as("hi_d"))
      .selectExpr(
        """stack(4,
          |  'center_cell', lo_u + 7 * (hi_u - lo_u) div 16, lo_u + 9 * (hi_u - lo_u) div 16,
          |                 lo_d + 7 * (hi_d - lo_d) div 16, lo_d + 9 * (hi_d - lo_d) div 16,
          |  'narrow_user', lo_u, lo_u + (hi_u - lo_u) div 8, lo_d, hi_d,
          |  'point_user',  lo_u, lo_u, lo_d, hi_d,
          |  'recent_days', lo_u, hi_u, hi_d - (hi_d - lo_d) div 8, hi_d
          |) AS (probe, u_lo, u_hi, d_lo, d_hi)""".stripMargin)

  def zoneMapPrune(events: DataFrame): DataFrame = {
    val base = ZOrder.baseFrame(events).localCheckpoint()
    val probes = probesFrame(base).localCheckpoint()
    val zones = ZOrder.zorderPlanFromBase(base)
    val overlap = expr(
      "NOT (max_user < u_lo OR min_user > u_hi OR max_day < d_lo OR min_day > d_hi)")
    val scan = zones.crossJoin(broadcast(probes))
      .groupBy("probe")
      .agg(count(lit(1)).as("n_buckets"),
        sum(when(overlap, 1L).otherwise(0L)).as("buckets_scanned"),
        sum(when(overlap, col("n_events")).otherwise(0L)).as("rows_scanned"),
        sum("n_events").as("rows_total"))
    val matched = base.join(broadcast(probes),
        col("user_id").between(col("u_lo"), col("u_hi")) &&
          col("day").between(col("d_lo"), col("d_hi")))
      .groupBy(col("probe").as("m_probe"))
      .agg(count(lit(1)).as("rows_matched"))
    scan.join(matched, col("probe") === col("m_probe"), "left")
      .select(col("probe"), col("n_buckets"), col("buckets_scanned"),
        expr("n_buckets - buckets_scanned").as("buckets_pruned"),
        col("rows_total"), col("rows_scanned"),
        expr("coalesce(rows_matched, CAST(0 AS BIGINT))").as("rows_matched"),
        expr("((rows_scanned - coalesce(rows_matched, 0)) * 1000000) div greatest(rows_scanned, 1)")
          .as("waste_ppm"))
  }

  def zoneMapPruneQ(events: DataFrame): DataFrame =
    zoneMapPrune(events).orderBy("probe")

  /** Rides [[ZOrder.BaseCteSql]] + [[ZOrder.ZonesCtesSql]] verbatim. */
  val zoneMapPruneSql: String =
    s"""WITH ${ZOrder.BaseCteSql}, ${ZOrder.ZonesCtesSql}, probes AS (
       |  SELECT 'center_cell' AS probe,
       |         lo_u + 7 * (hi_u - lo_u) // 16 AS u_lo, lo_u + 9 * (hi_u - lo_u) // 16 AS u_hi,
       |         lo_d + 7 * (hi_d - lo_d) // 16 AS d_lo, lo_d + 9 * (hi_d - lo_d) // 16 AS d_hi
       |  FROM stats
       |  UNION ALL
       |  SELECT 'narrow_user', lo_u, lo_u + (hi_u - lo_u) // 8, lo_d, hi_d FROM stats
       |  UNION ALL
       |  SELECT 'point_user', lo_u, lo_u, lo_d, hi_d FROM stats
       |  UNION ALL
       |  SELECT 'recent_days', lo_u, hi_u, hi_d - (hi_d - lo_d) // 8, hi_d FROM stats
       |), scan AS (
       |  SELECT p.probe,
       |         CAST(count(*) AS BIGINT) AS n_buckets,
       |         CAST(sum(CASE WHEN NOT (z.max_user < p.u_lo OR z.min_user > p.u_hi
       |                                 OR z.max_day < p.d_lo OR z.min_day > p.d_hi)
       |                  THEN 1 ELSE 0 END) AS BIGINT) AS buckets_scanned,
       |         CAST(sum(CASE WHEN NOT (z.max_user < p.u_lo OR z.min_user > p.u_hi
       |                                 OR z.max_day < p.d_lo OR z.min_day > p.d_hi)
       |                  THEN z.n_events ELSE 0 END) AS BIGINT) AS rows_scanned,
       |         CAST(sum(z.n_events) AS BIGINT) AS rows_total
       |  FROM zones z CROSS JOIN probes p
       |  GROUP BY 1
       |), m AS (
       |  SELECT p.probe, CAST(count(*) AS BIGINT) AS rows_matched
       |  FROM base b JOIN probes p
       |    ON b.user_id BETWEEN p.u_lo AND p.u_hi AND b.day BETWEEN p.d_lo AND p.d_hi
       |  GROUP BY 1
       |)
       |SELECT s.probe, s.n_buckets, s.buckets_scanned,
       |       s.n_buckets - s.buckets_scanned AS buckets_pruned,
       |       s.rows_total, s.rows_scanned,
       |       COALESCE(m.rows_matched, 0) AS rows_matched,
       |       ((s.rows_scanned - COALESCE(m.rows_matched, 0)) * 1000000)
       |         // greatest(s.rows_scanned, 1) AS waste_ppm
       |FROM scan s LEFT JOIN m ON s.probe = m.probe
       |ORDER BY s.probe""".stripMargin
}
