package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ROLLING distinct actives (round 8, continuation) — exact DAU and
  * trailing-7-day WAU per calendar day, the growth-metric pair every
  * event platform reports. Distinct-over-a-sliding-window is the one
  * rolling shape a window function CANNOT express (COUNT(DISTINCT) has
  * no frame form in either engine): the exact scalable form inverts the
  * window — each distinct (user, day) activity fact is exploded to the
  * ≤[[WindowDays]] report days it covers (day d's trailing window sees
  * activity from d-6..d ⇔ an activity at day a covers reports a..a+6),
  * then one COUNT(DISTINCT user) per report day. DAU rides the same
  * stream as a conditional distinct (cover day = activity day).
  *
  * Cross-engine exactness (§6): days are integer epoch µs div 86400e6
  * (the [[Retention]] convention); everything else is exact integer
  * counting. The report axis is the densified [min_day, max_day]
  * calendar ([[EventSeries]] pattern) so a fully-silent day still gets
  * its row — its WAU is the surviving trailing actives, not a gap.
  *
  * Scale shape: the (user, day) distinct is map-side combinable and
  * collapses raw event volume to ≤ |users|·days rows BEFORE the ×7
  * explode (order matters — exploding raw events first would 7× the
  * corpus); the explode is inline at the Generate child; the per-day
  * distinct shuffles (day, user) pairs. The axis/bounds frames are
  * 1-row / days-sized. Every shuffled row is two integers.
  */
object RollingActives {

  val UsPerDay: Long = Retention.UsPerDay

  /** Trailing window width in days (inclusive of the report day). */
  val WindowDays = 7

  def rollingActives(events: DataFrame, windowDays: Int = WindowDays): DataFrame = {
    val ud = events
      .select(col("user_id"), expr(s"unix_micros(ts) div $UsPerDay").as("day"))
      .distinct()
    val axis = ud.agg(min("day").as("min_day"), max("day").as("max_day"))
      .select(explode(expr("sequence(min_day, max_day)")).as("day"))
    val cover = ud
      .select(col("user_id"), col("day").as("active_day"),
        explode(expr(s"sequence(day, day + ${windowDays - 1})")).as("day"))
    val counts = cover.groupBy("day").agg(
      countDistinct(when(col("active_day") === col("day"), col("user_id"))).as("dau"),
      countDistinct("user_id").as("wau"))
    axis.join(counts, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"))
  }

  def rollingActivesQ(events: DataFrame): DataFrame =
    rollingActives(events).orderBy("day")

  /** DuckDB twin: identical inverted-window explode (generate_series),
    * identical conditional-distinct DAU. */
  val rollingActivesSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id,
       |         epoch_us(date_trunc('microseconds', ts)) // $UsPerDay AS day
       |  FROM events
       |), axis AS (
       |  SELECT unnest(generate_series(min_day, max_day)) AS day
       |  FROM (SELECT min(day) AS min_day, max(day) AS max_day FROM ud)
       |), cover AS (
       |  SELECT user_id, day AS active_day,
       |         unnest(generate_series(day, day + ${WindowDays - 1})) AS cday
       |  FROM ud
       |), c AS (
       |  SELECT cday AS day,
       |         CAST(count(DISTINCT CASE WHEN active_day = cday THEN user_id END) AS BIGINT) AS dau,
       |         CAST(count(DISTINCT user_id) AS BIGINT) AS wau
       |  FROM cover GROUP BY 1
       |)
       |SELECT axis.day,
       |       COALESCE(c.dau, 0) AS dau,
       |       COALESCE(c.wau, 0) AS wau
       |FROM axis LEFT JOIN c ON axis.day = c.day
       |ORDER BY axis.day""".stripMargin
}
