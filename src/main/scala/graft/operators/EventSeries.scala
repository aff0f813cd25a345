package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-filled per-user ACTIVITY SERIES (round 8, continuation) — time
  * DENSIFICATION, the one event-analytics shape the suite's funnel /
  * retention / outlier family doesn't cover: turn an irregular event
  * stream into a dense per-(user, day) matrix with explicit zero rows
  * for the silent days. Dense series are what downstream burn-rate,
  * moving-average and churn models consume — a gap IS the signal, and
  * it must exist as a row before a window function can see it.
  *
  * Cross-engine exactness (§6): days are integer epoch days
  * (`unix_micros div 86'400'000'000` — the [[Retention]] convention),
  * the densified axis is `sequence(min_day, max_day)` vs DuckDB's
  * `generate_series` (both closed-interval on integers), and daily value
  * mass rides as integer cents. No float, no timestamp arithmetic.
  *
  * Scale shape: per-user day bounds are one map-side-combinable agg; the
  * day axis is exploded INLINE from the sequence() expression (Generate
  * child is the expression — the 11× pushdown-trap rule), producing
  * Σ(span_u) rows — bounded by |users| · horizon_days, corpus-IRRELEVANT
  * (a year of days per user is 365 rows regardless of event volume). The
  * per-(user, day) daily rollup is a second combinable agg, and the
  * gap-fill join is (user_id, day)-keyed between two already-aggregated
  * frames. Every shuffled row is narrow integers.
  */
object EventSeries {

  val UsPerDay: Long = Retention.UsPerDay

  def eventSeries(events: DataFrame): DataFrame = {
    val days = events.select(col("user_id"),
      expr(s"unix_micros(ts) div $UsPerDay").as("day"),
      expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
    val daily = days.groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("value_cents"))
    val axis = days.groupBy("user_id")
      .agg(min("day").as("min_day"), max("day").as("max_day"))
      .select(col("user_id"),
        explode(expr("sequence(min_day, max_day)")).as("day"))
    axis.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"),
        (coalesce(col("n_events"), lit(0L)) > 0).as("is_active"))
  }

  def eventSeriesQ(events: DataFrame): DataFrame =
    eventSeries(events).orderBy("user_id", "day")

  val eventSeriesSql: String =
    s"""WITH e AS (
       |  SELECT user_id,
       |         epoch_us(date_trunc('microseconds', ts)) // $UsPerDay AS day,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents
       |  FROM events
       |), daily AS (
       |  SELECT user_id, day,
       |         CAST(count(*) AS BIGINT) AS n_events,
       |         CAST(sum(cents) AS BIGINT) AS value_cents
       |  FROM e GROUP BY 1, 2
       |), axis AS (
       |  SELECT user_id, unnest(generate_series(min_day, max_day)) AS day
       |  FROM (SELECT user_id, min(day) AS min_day, max(day) AS max_day
       |        FROM e GROUP BY 1)
       |)
       |SELECT a.user_id, a.day,
       |       COALESCE(d.n_events, 0) AS n_events,
       |       COALESCE(d.value_cents, 0) AS value_cents,
       |       COALESCE(d.n_events, 0) > 0 AS is_active
       |FROM axis a
       |LEFT JOIN daily d ON a.user_id = d.user_id AND a.day = d.day
       |ORDER BY a.user_id, a.day""".stripMargin
}
