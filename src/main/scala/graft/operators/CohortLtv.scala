package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COHORT LTV MATRIX (round 8, continuation 5) — [[Retention]]'s VALUE
  * twin: per signup cohort day, cumulative value banked by day offsets
  * 0/1/3/7/14 plus the per-user day-14 LTV — the revenue curve growth
  * accounting reads next to the retention curve (users can retain but
  * stop spending, or churn in count while whales carry value; the two
  * matrices disagreeing IS the signal).
  *
  * Cross-engine exactness (SURVEY §6): integer epoch days, exact BIGINT
  * cents, cumulative cells as conditional sums (`offset ≤ k`), per-user
  * LTV an integer div of non-negative operands. Cohort = min signup
  * day ([[Retention]]'s rule, one text would be overkill for a 3-line
  * CTE but the day algebra is the shared `UsPerDay` constant).
  *
  * Scale shape: value collapses to (user, day) BEFORE the cohort join
  * (sum-early — the retention dedup-early analog; |events| →
  * |user·days| ahead of the join), cohorts are user-keyed aggregates,
  * the join is user-keyed with offsets filtered to the 15-day horizon,
  * and the final agg is |cohort-days|-sized with every cell map-side
  * combinable. No windows.
  */
object CohortLtv {

  val Offsets: Seq[Int] = Seq(0, 1, 3, 7, 14)

  def cohortLtv(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"),
      expr(s"unix_micros(ts) div ${Retention.UsPerDay}").as("day"),
      expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
    val cohorts = base.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("cohort_day"))
    val value = base.groupBy("user_id", "day").agg(sum("cents").as("v"))
    val hits = cohorts.join(value, Seq("user_id"))
      .withColumn("off_d", col("day") - col("cohort_day"))
      .filter(col("off_d") >= 0 && col("off_d") <= Offsets.max)
    val vcols = Offsets.map(k =>
      sum(expr(s"CASE WHEN off_d <= $k THEN v ELSE 0 END")).as(s"v$k"))
    val sizes = cohorts.groupBy("cohort_day").agg(count(lit(1)).as("n_users"))
    sizes.join(hits.groupBy("cohort_day").agg(vcols.head, vcols.tail: _*),
        Seq("cohort_day"), "left")
      .select(col("cohort_day") +: col("n_users") +:
        (Offsets.map(k => coalesce(col(s"v$k"), lit(0L)).as(s"v${k}_cents")) :+
          expr(s"coalesce(v${Offsets.max}, 0) div n_users")
            .as("ltv14_per_user_cents")): _*)
  }

  def cohortLtvQ(events: DataFrame): DataFrame =
    cohortLtv(events).orderBy("cohort_day")

  val cohortLtvSql: String = {
    val vcols = Offsets.map(k =>
      s"CAST(sum(CASE WHEN off_d <= $k THEN v ELSE 0 END) AS BIGINT) AS v$k")
      .mkString(",\n       |         ")
    val coal = Offsets.map(k => s"COALESCE(h.v$k, 0) AS v${k}_cents").mkString(", ")
    s"""WITH base AS (
       |  SELECT user_id, event_type,
       |         epoch_us(date_trunc('microseconds', ts)) // ${Retention.UsPerDay} AS day,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents
       |  FROM events
       |), cohorts AS (
       |  SELECT user_id, min(day) AS cohort_day
       |  FROM base WHERE event_type = 'signup' GROUP BY 1
       |), value AS (
       |  SELECT user_id, day, CAST(sum(cents) AS BIGINT) AS v
       |  FROM base GROUP BY 1, 2
       |), hits AS (
       |  SELECT c.cohort_day, v.day - c.cohort_day AS off_d, v.v
       |  FROM cohorts c JOIN value v USING (user_id)
       |  WHERE v.day - c.cohort_day BETWEEN 0 AND ${Offsets.max}
       |), h AS (
       |  SELECT cohort_day,
       |         $vcols
       |  FROM hits GROUP BY 1
       |), sizes AS (
       |  SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users
       |  FROM cohorts GROUP BY 1
       |)
       |SELECT s.cohort_day, s.n_users, $coal,
       |       COALESCE(h.v${Offsets.max}, 0) // s.n_users AS ltv14_per_user_cents
       |FROM sizes s LEFT JOIN h ON h.cohort_day = s.cohort_day
       |ORDER BY s.cohort_day""".stripMargin
  }
}
