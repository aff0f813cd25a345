package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort RETENTION analytics (round 8, continuation) — the third member
  * of the event-analytics family ([[Sessionize]] groups within a visit,
  * [[Funnel]] orders stages within a user; this tracks users ACROSS
  * days): users cohorted by signup day, and for each cohort the count of
  * distinct members still active k days later — the day-N retention
  * matrix every product/engagement dashboard leads with.
  *
  * All time math is integer: epoch-µs (§6) floor-divided to epoch DAYS
  * (`div 86400000000`), offsets are integer day deltas, and every output
  * is a BIGINT distinct-user count — no timestamps, no timezone
  * arithmetic beyond the session-UTC truncation both engines share.
  *
  * Shape: per-user cohort day = one min-agg on user_id; the activity set
  * is DISTINCT (user, day) — the second exchange, and the row count
  * collapses from |events| to |user·active-days| BEFORE the join (dedup
  * early, join late: joining raw events first would carry every event
  * row through the join only to dedup after). The user-keyed
  * cohort↔activity join is UNHINTED (both sides |users|-proportional;
  * AQE decides). Day offsets are filtered to the report's offset list
  * (≤ |offsets| rows per user-day survive), then ONE conditional-sum agg
  * on cohort_day — |days| output rows. No window, no collect; every
  * aggregation is map-side combinable.
  *
  * Reference relation: read_gold.py:38-54's per-trial conditional flag
  * rollups are the unordered single-day cousin; the reference has no
  * cross-day analytics.
  */
object Retention {

  /** Day offsets reported (d0 = signup-day activity, by construction
    * every cohort member counts there). */
  val Offsets: Seq[Int] = Seq(0, 1, 3, 7, 14)

  val UsPerDay = 86400000000L

  def eventRetention(events: DataFrame, offsets: Seq[Int] = Offsets): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"),
      expr(s"unix_micros(ts) div $UsPerDay").as("day"))
    val cohorts = base.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("cohort_day"))
    val activity = base.select("user_id", "day").distinct()
    val offsetList = offsets.mkString(", ")
    val hits = cohorts.join(activity, Seq("user_id"))
      .withColumn("offset", col("day") - col("cohort_day"))
      .filter(expr(s"offset IN ($offsetList)"))
    val dcols = offsets.map(k =>
      sum(expr(s"CASE WHEN offset = $k THEN 1 ELSE 0 END")).cast("bigint").as(s"d$k"))
    val sizes = cohorts.groupBy("cohort_day").agg(count(lit(1)).as("n_users"))
    sizes.join(
      hits.groupBy("cohort_day").agg(dcols.head, dcols.tail: _*),
      Seq("cohort_day"), "left")
      .select(col("cohort_day") +: col("n_users") +:
        offsets.map(k => coalesce(col(s"d$k"), lit(0L)).as(s"d$k")): _*)
  }

  def eventRetentionQ(events: DataFrame): DataFrame =
    eventRetention(events).orderBy("cohort_day")

  /** DuckDB twin: same day algebra, same distinct-then-join order. */
  val eventRetentionSql: String = {
    // `offset` is reserved in DuckDB — the internal column is off_d there
    val dcols = Offsets.map(k =>
      s"CAST(sum(CASE WHEN off_d = $k THEN 1 ELSE 0 END) AS BIGINT) AS d$k")
      .mkString(",\n       |         ")
    val coal = Offsets.map(k => s"COALESCE(h.d$k, 0) AS d$k").mkString(", ")
    s"""WITH base AS (
       |  SELECT user_id, event_type,
       |         epoch_us(date_trunc('microseconds', ts)) // $UsPerDay AS day
       |  FROM events
       |), cohorts AS (
       |  SELECT user_id, min(day) AS cohort_day
       |  FROM base WHERE event_type = 'signup' GROUP BY 1
       |), activity AS (
       |  SELECT DISTINCT user_id, day FROM base
       |), hits AS (
       |  SELECT c.cohort_day, a.day - c.cohort_day AS off_d, a.user_id
       |  FROM cohorts c JOIN activity a USING (user_id)
       |  WHERE a.day - c.cohort_day IN (${Offsets.mkString(", ")})
       |), h AS (
       |  SELECT cohort_day,
       |         $dcols
       |  FROM hits GROUP BY 1
       |), sizes AS (
       |  SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users
       |  FROM cohorts GROUP BY 1
       |)
       |SELECT s.cohort_day, s.n_users, $coal
       |FROM sizes s LEFT JOIN h ON h.cohort_day = s.cohort_day
       |ORDER BY s.cohort_day""".stripMargin
  }
}
