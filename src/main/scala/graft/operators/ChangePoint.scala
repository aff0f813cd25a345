package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CHANGE-POINT DETECTION (round 10) — the level-shift question the
  * trend pair leaves open: [[RobustTrend]] reads a monotone drift,
  * [[RateSpike]] flags single anomalous days; neither answers "did this
  * event type's rate STEP to a new level, and when?" (a deploy, a
  * pricing change, an instrumentation break). Statistic: the classic
  * single-change-point CUSUM argmax in its EXACT integer form — for
  * observed days at positions i of n with prefix mass S_i, score(i) =
  * |S_i·n − i·S_n| (the cross-multiplied |mean_left − mean_right|
  * numerator, no division), maximized over split positions 1 ≤ i < n.
  * A flat series scores 0 everywhere (tie-break → earliest day,
  * spec-pinned); a clean step maximizes exactly at the step.
  *
  * §6: scores/masses BIGINT (≤ n·S_n — safe past 10¹⁴ daily events);
  * segment means reported in milli-events/day via non-negative div;
  * argmax totally ordered by (score DESC, day ASC).
  *
  * Scale shape: ONE data-volume aggregation (map-combinable daily
  * counts); everything after runs on the |types| × |days| frame with
  * both windows sharing the one type-keyed exchange (same partitioning,
  * orderings compatible). Horizon-bounded like robust_trend, without
  * the pair join.
  */
object ChangePoint {

  private val UsPerDay = 86400000000L

  def changePoint(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), expr(s"unix_micros(ts) div $UsPerDay").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy("event_type").orderBy("day")
    val whole = Window.partitionBy("event_type")
    val scored = daily
      .withColumn("i", row_number().over(byDay))
      .withColumn("s_i", sum(col("n")).over(byDay))
      .withColumn("n_days", count(lit(1)).over(whole))
      .withColumn("s_n", sum(col("n")).over(whole))
      .filter(col("i") < col("n_days"))
      .withColumn("score", expr("abs(s_i * n_days - i * s_n)"))
    val best = Window.partitionBy("event_type")
      .orderBy(col("score").desc, col("day"))
    scored
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("score").as("cusum_score"), col("n_days"),
        expr("(s_i * 1000) div i").as("mean_before_milli"),
        expr("((s_n - s_i) * 1000) div (n_days - i)").as("mean_after_milli"))
      .orderBy("event_type")
  }

  def changePointQ(events: DataFrame): DataFrame = changePoint(events)

  val changePointSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(date_trunc('microseconds', ts)) // $UsPerDay AS day,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2
       |), scored AS (
       |  SELECT event_type, day,
       |         CAST(row_number() OVER w AS BIGINT) AS i,
       |         CAST(sum(n) OVER w AS BIGINT) AS s_i,
       |         CAST(count(*) OVER p AS BIGINT) AS n_days,
       |         CAST(sum(n) OVER p AS BIGINT) AS s_n
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         p AS (PARTITION BY event_type)
       |), ranked AS (
       |  SELECT event_type, day, i, s_i, n_days, s_n,
       |         abs(s_i * n_days - i * s_n) AS score,
       |         row_number() OVER (PARTITION BY event_type
       |           ORDER BY abs(s_i * n_days - i * s_n) DESC, day) AS rk
       |  FROM scored
       |  WHERE i < n_days
       |)
       |SELECT event_type, day AS split_day, score AS cusum_score, n_days,
       |       (s_i * 1000) // i AS mean_before_milli,
       |       ((s_n - s_i) * 1000) // (n_days - i) AS mean_after_milli
       |FROM ranked
       |WHERE rk = 1
       |ORDER BY event_type""".stripMargin
}
