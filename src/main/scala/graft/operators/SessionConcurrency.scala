package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session CONCURRENCY curve (round 8, continuation) — per clock hour,
  * how many sessions (and distinct users) were live: the load curve
  * behind capacity planning and the denominator for per-slot error
  * rates. A session is live in every hour bucket its [start, end] span
  * overlaps — the same span-to-bucket explode as [[IntervalJoin]]'s
  * index side, consumed here as the report itself rather than as a join
  * key.
  *
  * Cross-engine exactness (§6): hours are integer `µs div 3600e6`;
  * sessions come from [[Sessionize.sessionize]] and the oracle nests
  * [[Sessionize.sessionCtes]] verbatim (the shared-CTE convention), so
  * the session definition cannot drift between the gap rollup, the
  * containment join and this curve. Counting is exact integers.
  *
  * Scale shape: sessions are already an aggregate (≤ event volume);
  * the hour explode emits span/3600s replicas per session — gap-bounded
  * sessions span few hours — inline at the Generate child; the rollup
  * is map-side combinable on ≤ horizon-hours keys. A point-in-time
  * maximum-concurrency sweep line would need a global running sum (one
  * reducer or offset algebra); the hour-bucket contract keeps the whole
  * curve embarrassingly parallel, which is why it is the shipped form.
  */
object SessionConcurrency {

  val UsPerHour = 3600000000L

  def sessionConcurrency(events: DataFrame): DataFrame = {
    Sessionize.sessionize(events)
      .select(col("user_id"),
        explode(expr(
          s"sequence(session_start_us div $UsPerHour, session_end_us div $UsPerHour)"))
          .as("hour"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n_sessions"), countDistinct("user_id").as("n_users"))
      .select(col("hour"), col("n_sessions"), col("n_users"))
  }

  def sessionConcurrencyQ(events: DataFrame): DataFrame =
    sessionConcurrency(events).orderBy("hour")

  val sessionConcurrencySql: String =
    s"""WITH ${Sessionize.sessionCtes}, spans AS (
       |  SELECT user_id,
       |         unnest(generate_series(session_start_us // $UsPerHour,
       |                                session_end_us // $UsPerHour)) AS hour
       |  FROM sess
       |)
       |SELECT hour,
       |       CAST(count(*) AS BIGINT) AS n_sessions,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |FROM spans
       |GROUP BY hour
       |ORDER BY hour""".stripMargin
}
