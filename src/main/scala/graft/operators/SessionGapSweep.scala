package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SESSION-GAP SENSITIVITY SWEEP (round 8, continuation 5) — how many
  * sessions the corpus splits into at each candidate inactivity gap:
  * the calibration readout that PICKS [[Sessionize.GapUs]] (the
  * elbow of this curve is where the gap dial belongs, and
  * [[Interarrival]]'s cadence histogram is its per-type sibling). The
  * sweep includes the shipped 360-min production gap, so the spec can
  * cross-derive that row against [[Sessionize.sessionize]] itself —
  * the sweep and the operator provably share one gap rule.
  *
  * Cross-engine exactness (SURVEY §6): integer-µs gaps over the
  * (t_us, event_id) total order ([[Sessionize.sessionTagged]]'s
  * order), exact BIGINT session counts (`first-events + gap
  * exceedances`), events-per-session integer milli.
  *
  * Scale shape: ONE user-keyed lag exchange (the sessionize exchange
  * itself), then a 1-ROW aggregate with one conditional sum per
  * candidate gap, unpivoted to |gaps| rows by an inline stack — the
  * sweep costs ONE pass regardless of how many gaps it prices
  * (the naive per-gap re-sessionization would be |gaps| full window
  * passes). No joins, no data-scaled second exchange.
  */
object SessionGapSweep {

  /** Candidate gaps (minutes); includes the shipped 360-min gap. */
  val GapsMin: Seq[Int] = Seq(5, 15, 60, 360)

  def sessionGapSweep(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    val lagged = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
      .withColumn("prev_us", lag("t_us", 1).over(w))
    val gcols = GapsMin.map { g =>
      sum(expr(s"CASE WHEN prev_us IS NOT NULL AND t_us - prev_us > ${g * 60000000L} " +
        "THEN 1 ELSE 0 END")).as(s"b$g")
    }
    val aggCols = Seq(
      sum(expr("CASE WHEN prev_us IS NULL THEN 1 ELSE 0 END")).as("n_users"),
      count(lit(1)).as("n_events")) ++ gcols
    val agg = lagged.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = GapsMin
      .map(g => s"CAST($g AS BIGINT), n_users + b$g").mkString(", ")
    agg.selectExpr("n_users", "n_events",
        s"stack(${GapsMin.size}, $stackArgs) AS (gap_min, n_sessions)")
      .filter(col("n_events") > 0) // empty corpus → zero rows, and no div-0
      .select(col("gap_min"), col("n_users"), col("n_sessions"), col("n_events"),
        expr("(n_events * 1000) div n_sessions").as("events_per_session_milli"))
  }

  def sessionGapSweepQ(events: DataFrame): DataFrame =
    sessionGapSweep(events).orderBy("gap_min")

  val sessionGapSweepSql: String = {
    val gcols = GapsMin.map(g =>
      s"CAST(sum(CASE WHEN prev_us IS NOT NULL AND t_us - prev_us > ${g * 60000000L} " +
        s"THEN 1 ELSE 0 END) AS BIGINT) AS b$g").mkString(",\n       |         ")
    val rows = GapsMin.map(g =>
      s"SELECT CAST($g AS BIGINT) AS gap_min, n_users, n_users + b$g AS n_sessions, n_events FROM agg")
      .mkString("\n       |  UNION ALL ")
    s"""WITH lagged AS (
       |  SELECT user_id,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
       |         lag(epoch_us(date_trunc('microseconds', ts)), 1) OVER
       |           (PARTITION BY user_id
       |            ORDER BY epoch_us(date_trunc('microseconds', ts)), event_id) AS prev_us
       |  FROM events
       |), agg AS (
       |  SELECT CAST(sum(CASE WHEN prev_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
       |         CAST(count(*) AS BIGINT) AS n_events,
       |         $gcols
       |  FROM lagged
       |), rows_out AS (
       |  $rows
       |)
       |SELECT gap_min, n_users, n_sessions, n_events,
       |       (n_events * 1000) // n_sessions AS events_per_session_milli
       |FROM rows_out
       |WHERE n_events > 0
       |ORDER BY gap_min""".stripMargin
  }
}
