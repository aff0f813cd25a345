package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-user LIFETIME VALUE frame (round 8, continuation) — the
  * customer-360 rollup: tenure span, active-day count, event and value
  * mass, and the value-per-active-day intensity, one row per user. The
  * flat feature frame a churn/LTV model trains on — [[Retention]] gives
  * the cohort matrix, [[DecayScore]] the recency weighting; this is the
  * undecayed per-entity summary both join against.
  *
  * Cross-engine exactness (§6): days are integer epoch days, value is
  * integer cents, intensity is integer `cents div active_days`
  * (active_days ≥ 1 whenever the row exists — a user with any event has
  * an active day, so no zero-guard ambiguity). The purchase split rides
  * the same pass as a conditional sum.
  *
  * Scale shape: ONE map pass + ONE map-side-combinable per-user
  * aggregation (the active-day distinct rides as count(DISTINCT day)
  * inside the same agg — Spark plans the two-phase distinct rewrite);
  * output is |users| rows. Nothing else touches event volume.
  */
object UserLtv {

  def userLtv(events: DataFrame): DataFrame = {
    events
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${Retention.UsPerDay}").as("day"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"),
        col("event_type"))
      .groupBy("user_id")
      .agg(
        min("day").as("first_day"),
        max("day").as("last_day"),
        countDistinct("day").as("active_days"),
        count(lit(1)).as("n_events"),
        sum("cents").as("value_cents"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(lit(0L))).as("purchase_cents"))
      .withColumn("tenure_days", expr("last_day - first_day + 1"))
      .withColumn("cents_per_active_day", expr("value_cents div active_days"))
      .select(col("user_id"), col("first_day"), col("last_day"),
        col("tenure_days"), col("active_days"), col("n_events"),
        col("value_cents"), col("purchase_cents"), col("cents_per_active_day"))
  }

  def userLtvQ(events: DataFrame): DataFrame =
    userLtv(events).orderBy("user_id")

  val userLtvSql: String =
    s"""WITH e AS (
       |  SELECT user_id,
       |         epoch_us(date_trunc('microseconds', ts)) // ${Retention.UsPerDay} AS day,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents,
       |         event_type
       |  FROM events
       |)
       |SELECT user_id,
       |       min(day) AS first_day,
       |       max(day) AS last_day,
       |       max(day) - min(day) + 1 AS tenure_days,
       |       CAST(count(DISTINCT day) AS BIGINT) AS active_days,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(cents) AS BIGINT) AS value_cents,
       |       CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END) AS BIGINT) AS purchase_cents,
       |       CAST(sum(cents) AS BIGINT) // CAST(count(DISTINCT day) AS BIGINT) AS cents_per_active_day
       |FROM e
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
}
