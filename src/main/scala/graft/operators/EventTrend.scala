package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window TREND over the densified series (round 8,
  * continuation) — the consumer [[EventSeries]] exists for: 7-day
  * trailing activity per (user, day), the week-over-week delta, and a
  * churn-risk verdict when a whole trailing week is silent. Composes two
  * suite operators: densify first (gaps must EXIST as rows before a
  * frame can count them — the reason event_series emits zero rows), then
  * a RANGE frame over the integer day axis.
  *
  * Cross-engine exactness (§6): the frame is `RANGE BETWEEN 6 PRECEDING
  * AND CURRENT ROW` over integer epoch days — value-based, identical
  * semantics both engines (on the dense axis it coincides with ROWS, but
  * RANGE is the honest contract: it stays correct if a consumer filters
  * the series before trending). Sums are BIGINT counts/cents; the WoW
  * delta is a difference of two trailing sums via `lag(trail7, 7)`
  * coalesced to 0 at the head — all integers.
  *
  * Scale shape: the series' own (user_id, day) frames flow into ONE
  * user-keyed exchange shared by both windows (same partitioning, two
  * sorts collapse to one — same day ordering); rows are |users| ·
  * horizon, corpus-irrelevant. No new data-scaled shuffle beyond the
  * series' own.
  */
object EventTrend {

  def eventTrend(series: DataFrame): DataFrame = {
    val frame = Window.partitionBy("user_id").orderBy(col("day"))
      .rangeBetween(-6, Window.currentRow)
    val byDay = Window.partitionBy("user_id").orderBy(col("day"))
    series
      .withColumn("trail7_events", sum("n_events").over(frame))
      .withColumn("trail7_cents", sum("value_cents").over(frame))
      .withColumn("wow_delta",
        col("trail7_events") -
          coalesce(lag(col("trail7_events"), 7).over(byDay), lit(0L)))
      .withColumn("churn_risk", col("trail7_events") === 0L)
      .select(col("user_id"), col("day"), col("n_events"),
        col("trail7_events"), col("trail7_cents"), col("wow_delta"),
        col("churn_risk"))
  }

  def eventTrendQ(events: DataFrame): DataFrame =
    eventTrend(EventSeries.eventSeries(events)).orderBy("user_id", "day")

  /** Oracle nests the event_series text verbatim (the suite's shared-CTE
    * convention) so the two contracts cannot drift. */
  val eventTrendSql: String = {
    val seriesCte = EventSeries.eventSeriesSql
      .replace("ORDER BY a.user_id, a.day", "")
    s"""WITH series AS (
       |$seriesCte
       |), t AS (
       |  SELECT user_id, day, n_events,
       |         CAST(sum(n_events) OVER w7 AS BIGINT) AS trail7_events,
       |         CAST(sum(value_cents) OVER w7 AS BIGINT) AS trail7_cents
       |  FROM series
       |  WINDOW w7 AS (PARTITION BY user_id ORDER BY day
       |                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
       |)
       |SELECT user_id, day, n_events, trail7_events, trail7_cents,
       |       trail7_events - COALESCE(lag(trail7_events, 7)
       |         OVER (PARTITION BY user_id ORDER BY day), 0) AS wow_delta,
       |       trail7_events = 0 AS churn_risk
       |FROM t
       |ORDER BY user_id, day""".stripMargin
  }
}
