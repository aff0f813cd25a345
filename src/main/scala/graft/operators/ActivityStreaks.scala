package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ACTIVITY STREAKS (round 8, continuation 5) — the consecutive-day
  * gaps-and-islands classic on the activity calendar: each user's
  * active days group into maximal runs (`day − row_number()` constant
  * within a run — the [[WinnowAlign]] island key on days instead of
  * token diagonals), reported as the streak-length distribution with
  * per-length user mass — the habit-strength readout next to
  * [[GrowthAccounting]]'s flow ledger and the engagement feature
  * ([[UserLtv]]'s frame) a streak-based product mechanic is tuned by.
  * One row per streak length: how many streaks, how many distinct
  * users own one, and how many are each user's PERSONAL BEST.
  *
  * Cross-engine exactness (SURVEY §6): integer epoch days, exact
  * BIGINT counts; the island key is exact integer arithmetic over the
  * per-user distinct-day order (total — distinct days can't tie);
  * best-streak ties (a user whose longest length appears twice) count
  * once, via max-over-user before the distribution.
  *
  * Scale shape: distinct (user, day) first (dedup-early), the island
  * tag and run rollup ride ONE user exchange (row_number, then
  * (user, island) and (user) aggregations are co-partitioned — no
  * second data-scaled exchange; spec-pinned), distribution is
  * ≤ |distinct lengths| rows.
  */
object ActivityStreaks {

  def activityStreaks(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${Retention.UsPerDay}").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val runs = ud
      .withColumn("island", expr("day - row_number() OVER " +
        "(PARTITION BY user_id ORDER BY day)"))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
    val best = runs.groupBy("user_id").agg(max("len").as("best"))
    val dist = runs.groupBy(col("len").as("streak_days"))
      .agg(count(lit(1)).as("n_streaks"),
        countDistinct("user_id").as("n_users"))
    val bestDist = best.groupBy(col("best").as("streak_days"))
      .agg(count(lit(1)).as("n_personal_best"))
    dist.join(bestDist, Seq("streak_days"), "left")
      .select(col("streak_days"), col("n_streaks"), col("n_users"),
        coalesce(col("n_personal_best"), lit(0L)).as("n_personal_best"))
  }

  def activityStreaksQ(events: DataFrame): DataFrame =
    activityStreaks(events).orderBy("streak_days")

  val activityStreaksSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id,
       |         epoch_us(date_trunc('microseconds', ts)) // ${Retention.UsPerDay} AS day
       |  FROM events
       |), runs AS (
       |  SELECT user_id,
       |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
       |  FROM ud
       |), runs1 AS (
       |  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
       |  FROM runs GROUP BY 1, 2
       |), best AS (
       |  SELECT user_id, max(len) AS best FROM runs1 GROUP BY 1
       |), dist AS (
       |  SELECT len AS streak_days,
       |         CAST(count(*) AS BIGINT) AS n_streaks,
       |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
       |  FROM runs1 GROUP BY 1
       |), bestdist AS (
       |  SELECT best AS streak_days, CAST(count(*) AS BIGINT) AS n_personal_best
       |  FROM best GROUP BY 1
       |)
       |SELECT d.streak_days, d.n_streaks, d.n_users,
       |       COALESCE(b.n_personal_best, 0) AS n_personal_best
       |FROM dist d LEFT JOIN bestdist b ON b.streak_days = d.streak_days
       |ORDER BY d.streak_days""".stripMargin
}
