package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Funnel TRANSITION LATENCY (round 8, continuation) — [[Funnel]] says
  * how many users convert; this says how LONG each stage transition
  * takes: per adjacent stage pair, the converting users' latency
  * distribution as exact rank-selected quantiles (min/p50/p90/max in
  * integer µs) — the numbers a product/protocol analyst reads to find
  * WHICH hop stalls. Quantiles are type-1 rank selection (the
  * [[LengthQuantiles]] convention: index `(n−1)·p div 100`, ties broken
  * by user_id — no interpolation, engine-exact).
  *
  * §6: latencies are BIGINT µs differences of the funnel's conditional-
  * min stage times (strictly positive by the funnel's strict-sequence
  * construction); every output is a BIGINT or string. The stage-time
  * unpivot is an inline stack() with user_id carried for the tie-break.
  *
  * Scale shape: rides [[Funnel.eventFunnel]]'s one user exchange, then
  * the unpivot (|users| · |transitions| narrow rows) flows into ONE
  * transition-keyed exchange that the count window, the rank sort and
  * the closing aggregate all share (spec-pinned, the LengthQuantiles
  * plan class). Output is |stages|−1 rows.
  */
object FunnelLatency {

  def funnelLatency(events: DataFrame,
                    stages: Seq[String] = Funnel.Stages): DataFrame = {
    val funnel = Funnel.eventFunnel(events, stages)
    val arms = stages.indices.dropRight(1).map { i =>
      s"'${stages(i)}->${stages(i + 1)}', t${i + 1}_us - t${i}_us"
    }.mkString(", ")
    val lats = funnel
      .select(col("user_id"),
        expr(s"stack(${stages.size - 1}, $arms) AS (transition, lat_us)"))
      .filter(col("lat_us").isNotNull)
    val wt = Window.partitionBy("transition")
    val wr = wt.orderBy(col("lat_us"), col("user_id"))
    lats
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("rn", row_number().over(wr))
      .groupBy("transition")
      .agg(max("n").as("n_users"),
        min("lat_us").as("min_us"),
        max(when(expr("rn = (n - 1) * 50 div 100 + 1"), col("lat_us"))).as("p50_us"),
        max(when(expr("rn = (n - 1) * 90 div 100 + 1"), col("lat_us"))).as("p90_us"),
        max("lat_us").as("max_us"))
      .orderBy("transition")
  }

  def funnelLatencyQ(events: DataFrame): DataFrame =
    funnelLatency(events)

  /** Oracle nests the funnel CTE chain re-derived from the same stage
    * list (identical chained conditional-min text as eventFunnelSql's). */
  val funnelLatencySql: String = {
    val stages = Funnel.Stages
    val sCtes = stages.indices.map { i =>
      val cond =
        if (i == 0) s"event_type = '${stages(i)}'"
        else s"event_type = '${stages(i)}' AND t_us > t${i - 1}_us"
      s"""s$i AS (
         |  SELECT *, min(CASE WHEN $cond THEN t_us END)
         |              OVER (PARTITION BY user_id) AS t${i}_us
         |  FROM ${if (i == 0) "base" else s"s${i - 1}"}
         |)"""
    }.mkString(", ")
    val tCols = stages.indices.map(i => s"min(t${i}_us) AS t${i}_us").mkString(", ")
    val armSelects = stages.indices.dropRight(1).map { i =>
      s"""SELECT user_id, '${stages(i)}->${stages(i + 1)}' AS transition,
         |         t${i + 1}_us - t${i}_us AS lat_us FROM f"""
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH base AS (
       |  SELECT user_id, event_type,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us
       |  FROM events
       |), $sCtes, f AS (
       |  SELECT user_id, $tCols FROM s${stages.size - 1} GROUP BY user_id
       |), lats AS (
       |  $armSelects
       |), ranked AS (
       |  SELECT transition, lat_us,
       |         CAST(count(*) OVER (PARTITION BY transition) AS BIGINT) AS n,
       |         row_number() OVER (PARTITION BY transition
       |                            ORDER BY lat_us, user_id) AS rn
       |  FROM lats WHERE lat_us IS NOT NULL
       |)
       |SELECT transition,
       |       max(n) AS n_users,
       |       min(lat_us) AS min_us,
       |       max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN lat_us END) AS p50_us,
       |       max(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN lat_us END) AS p90_us,
       |       max(lat_us) AS max_us
       |FROM ranked
       |GROUP BY transition
       |ORDER BY transition""".stripMargin
  }
}
