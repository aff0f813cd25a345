package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-DECAYED engagement score (round 8, continuation) — per-user
  * recency-weighted value mass: each event's cents are halved for every
  * completed [[HalfLifeDays]]-day half-life between the event and the
  * corpus's max day, then summed. The standard ranking/churn feature
  * ("recent activity counts more") that plain lifetime sums
  * ([[Retention]], [[EventTrend]]) deliberately don't express.
  *
  * Cross-engine exactness (§6): exponential decay is the textbook float
  * trap (`exp(-λt)` sums order-dependently), so the weight is DYADIC and
  * the domain INTEGER: age bucket `k = (ref_day - day) div H`, weight
  * 2^-k applied as `(cents · 10⁶) div 2^k` in int64 (one shiftleft, one
  * integer division — both engines bit-exact, summation
  * order-independent). k is capped at [[MaxShift]] (weight underflows to
  * 0 µ¢ long before). Gate values are nonnegative; a signed deployment
  * would factor the division through sign·(|num| div den) (the
  * [[Lexicon]] truncation discipline) — pinned out of contract here.
  *
  * Scale shape: one map pass over events against the 1-row broadcast
  * ref-day fact (documented nested-loop class), then one
  * map-side-combinable per-user aggregation. Nothing else touches data
  * volume.
  */
object DecayScore {

  val UsPerDay: Long = Retention.UsPerDay

  /** Half-life in days: weight halves per completed window. */
  val HalfLifeDays = 7

  /** Shift cap: 2^40 µ¢-per-cent already rounds every real cents value
    * to 0 — capping keeps the shiftleft in int64 for any time range. */
  val MaxShift = 40

  def eventDecayScore(events: DataFrame, halfLifeDays: Int = HalfLifeDays): DataFrame = {
    val e = events.select(col("user_id"),
      expr(s"unix_micros(ts) div $UsPerDay").as("day"),
      expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
    val ref = e.agg(max("day").as("ref_day"))
    e.crossJoin(broadcast(ref))
      .withColumn("k",
        expr(s"CAST(least((ref_day - day) div $halfLifeDays, $MaxShift) AS INT)"))
      .withColumn("decayed_ucents",
        expr("(cents * 1000000) div shiftleft(CAST(1 AS BIGINT), k)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max("day").as("last_day"),
        sum("cents").as("raw_cents"),
        sum("decayed_ucents").as("decayed_ucents"))
      .select("user_id", "last_day", "n_events", "raw_cents", "decayed_ucents")
  }

  def eventDecayScoreQ(events: DataFrame): DataFrame =
    eventDecayScore(events).orderBy("user_id")

  /** DuckDB twin: identical dyadic-weight integer pipeline (`<<` / `//`). */
  val eventDecayScoreSql: String =
    s"""WITH e AS (
       |  SELECT user_id,
       |         epoch_us(date_trunc('microseconds', ts)) // $UsPerDay AS day,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents
       |  FROM events
       |), ref AS (
       |  SELECT max(day) AS ref_day FROM e
       |), d AS (
       |  SELECT user_id, day, cents,
       |         (cents * 1000000) // (CAST(1 AS BIGINT) <<
       |            CAST(least((ref_day - day) // $HalfLifeDays, $MaxShift) AS INT)) AS decayed_ucents
       |  FROM e CROSS JOIN ref
       |)
       |SELECT user_id,
       |       max(day) AS last_day,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(cents) AS BIGINT) AS raw_cents,
       |       CAST(sum(decayed_ucents) AS BIGINT) AS decayed_ucents
       |FROM d
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
}
