package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** WINSORIZATION report (round 8, continuation) — per event type, clamp
  * values at the exact p1/p99 order statistics and report what the clamp
  * would change: bounds, clipped counts both sides, raw vs winsorized
  * value mass. The silver-layer heavy-tail treatment
  * ([[RobustOutlier]] FLAGS per-entity outliers; winsorizing BOUNDS the
  * column so a fat-finger value can't dominate a mean) — shipped as a
  * report, the clamp itself being one `greatest(least(v, hi), lo)` the
  * consumer applies.
  *
  * Cross-engine exactness (§6): bounds are rank-selected exact cents
  * ([[LengthQuantiles]] type-1 convention, value-tie-stable); all sums
  * and counts are BIGINTs; the winsorized mass substitutes the exact
  * integer bound for clipped rows inside one conditional sum.
  *
  * Scale shape: per-type rank windows over the cents stream (one
  * exchange), bounds frame ≤ |types| rows broadcast back against a
  * second scan — the documented two-pass exception class
  * ([[Curation.qualitySelect]]); both aggregations map-side combinable.
  */
object Winsorize {

  val LoPct = 1
  val HiPct = 99

  def winsorize(events: DataFrame): DataFrame = {
    val vals = events.select(col("event_type"),
      expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
    val per = Window.partitionBy("event_type")
    val ord = Window.partitionBy("event_type").orderBy(col("cents"))
    val bounds = vals
      .withColumn("n", count(lit(1)).over(per))
      .withColumn("rn", row_number().over(ord))
      .groupBy("event_type")
      .agg(max("n").as("n_rows"),
        max(when(expr(s"rn = ((n - 1) * $LoPct) div 100 + 1"), col("cents"))).as("lo_cents"),
        max(when(expr(s"rn = ((n - 1) * $HiPct) div 100 + 1"), col("cents"))).as("hi_cents"))
    vals.join(broadcast(bounds), Seq("event_type"))
      .groupBy("event_type")
      .agg(max("n_rows").as("n_rows"), max("lo_cents").as("lo_cents"),
        max("hi_cents").as("hi_cents"),
        coalesce(sum(when(col("cents") < col("lo_cents"), 1L)), lit(0L)).as("n_clipped_lo"),
        coalesce(sum(when(col("cents") > col("hi_cents"), 1L)), lit(0L)).as("n_clipped_hi"),
        sum("cents").as("sum_cents_raw"),
        sum(expr("greatest(least(cents, hi_cents), lo_cents)")).as("sum_cents_wins"))
      .select(col("event_type"), col("n_rows"), col("lo_cents"), col("hi_cents"),
        col("n_clipped_lo"), col("n_clipped_hi"), col("sum_cents_raw"),
        col("sum_cents_wins"))
  }

  def winsorizeQ(events: DataFrame): DataFrame =
    winsorize(events).orderBy("event_type")

  val winsorizeSql: String =
    s"""WITH v AS (
       |  SELECT event_type, CAST(round(value * 100.0) AS BIGINT) AS cents
       |  FROM events
       |), ranked AS (
       |  SELECT event_type, cents,
       |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
       |         CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS rn
       |  FROM v
       |), bounds AS (
       |  SELECT event_type, CAST(max(n) AS BIGINT) AS n_rows,
       |         max(CASE WHEN rn = ((n - 1) * $LoPct) // 100 + 1 THEN cents END) AS lo_cents,
       |         max(CASE WHEN rn = ((n - 1) * $HiPct) // 100 + 1 THEN cents END) AS hi_cents
       |  FROM ranked GROUP BY 1
       |)
       |SELECT v.event_type, b.n_rows, b.lo_cents, b.hi_cents,
       |       CAST(COALESCE(sum(CASE WHEN v.cents < b.lo_cents THEN 1 END), 0) AS BIGINT) AS n_clipped_lo,
       |       CAST(COALESCE(sum(CASE WHEN v.cents > b.hi_cents THEN 1 END), 0) AS BIGINT) AS n_clipped_hi,
       |       CAST(sum(v.cents) AS BIGINT) AS sum_cents_raw,
       |       CAST(sum(greatest(least(v.cents, b.hi_cents), b.lo_cents)) AS BIGINT) AS sum_cents_wins
       |FROM v JOIN bounds b ON v.event_type = b.event_type
       |GROUP BY v.event_type, b.n_rows, b.lo_cents, b.hi_cents
       |ORDER BY v.event_type""".stripMargin
}
