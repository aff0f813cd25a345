package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TIME-WEIGHTED average value (round 8, continuation) — the analytic
  * the plain mean gets WRONG on irregular streams: a sensor reading (or
  * price) holds until the next observation, so its weight is the time it
  * was in force, not 1. TWAP per user = ∫ value dt / span, computed as
  * the exact step-function integral `Σ cents_i · (t_{i+1} − t_i)` over
  * the (t, event_id)-ordered stream — the [[EventSeries]] family's
  * integral sibling (trend counts events; this weighs their durations).
  *
  * Cross-engine exactness (§6): durations are integer µs from lead();
  * values ride as integer cents; the weighted sum is a BIGINT Σ (µs ×
  * cents — bounded by span · max_cents per user, ≪ 2⁶³ for any realistic
  * stream); twap_cents = `wsum div span` with a greatest-1 guard, so a
  * single-event user (span 0) reads 0 — total, spec-pinned. The final
  * division is the only displayed ratio and stays integer cents.
  *
  * Scale shape: ONE user-keyed exchange shared by the lead window and
  * the per-user aggregation (same partitioning — the [[EventTransitions]]
  * plan class). Narrow rows (user, µs, cents) reach the shuffle.
  */
object Twap {

  def twap(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      .withColumn("dt_us",
        coalesce(lead(col("t_us"), 1).over(w) - col("t_us"), lit(0L)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (max("t_us") - min("t_us")).as("span_us"),
        sum(expr("cents * dt_us")).as("wsum"))
      .withColumn("twap_cents", expr("wsum div greatest(span_us, 1)"))
      .select(col("user_id"), col("n_events"), col("span_us"),
        col("twap_cents"))
  }

  def twapQ(events: DataFrame): DataFrame =
    twap(events).orderBy("user_id")

  val twapSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id,
      |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
      |         CAST(round(value * 100.0) AS BIGINT) AS cents
      |  FROM events
      |), d AS (
      |  SELECT user_id, t_us, cents,
      |         COALESCE(lead(t_us) OVER (PARTITION BY user_id
      |                                   ORDER BY t_us, event_id) - t_us, 0) AS dt_us
      |  FROM e
      |), g AS (
      |  SELECT user_id,
      |         CAST(count(*) AS BIGINT) AS n_events,
      |         max(t_us) - min(t_us) AS span_us,
      |         CAST(sum(cents * dt_us) AS BIGINT) AS wsum
      |  FROM d GROUP BY 1
      |)
      |SELECT user_id, n_events, span_us,
      |       wsum // greatest(span_us, 1) AS twap_cents
      |FROM g
      |ORDER BY user_id""".stripMargin
}
