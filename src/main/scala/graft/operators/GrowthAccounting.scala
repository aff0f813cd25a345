package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GROWTH ACCOUNTING (round 8, continuation 5) — the DAU ledger every
  * growth team closes the day with: each active (user, day) classified
  * NEW (first day ever), RETAINED (also active the previous day) or
  * RESURRECTED (returning after a gap), plus CHURNED rows on the day a
  * user's absence starts — and the identity that makes it a LEDGER:
  * dau(d) = dau(d−1) + new + resurrected − churned, which only closes
  * if every user is in exactly one bucket (spec-pinned on the gate
  * stream). [[Retention]] tracks fixed cohorts at fixed offsets; this
  * is the day-over-day flow decomposition of the same activity facts.
  *
  * Cross-engine exactness (SURVEY §6): integer epoch days, exact
  * BIGINT counts, the per-user day sequence lag runs over a total
  * order (distinct days per user). Churn lands on `day + 1` whenever
  * the NEXT active day isn't day+1 — including never (lead NULL): a
  * permanently lapsed user churns the morning after their last day,
  * which is exactly what makes churned(d) ≡ active(d−1) ∖ active(d)
  * and closes the ledger (the lag-only form would silently exempt
  * permanent lapse and the identity would not balance).
  *
  * Scale shape: distinct (user, day) FIRST (dedup-early), then lag
  * AND lead over the SAME (user, day-order) window — one exchange,
  * one sort; churn rows derive from that one stream (no second
  * window pass), one |days|-sized rollup, full-outer day spine so an
  * all-churn day still reports. No joins against the raw stream.
  */
object GrowthAccounting {

  def growthAccounting(events: DataFrame): DataFrame = {
    val ud = events
      .select(col("user_id"),
        expr(s"unix_micros(ts) div ${Retention.UsPerDay}").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    val lagged = ud.withColumn("prev_day", lag("day", 1).over(w))
      .withColumn("next_day", lead("day", 1).over(w))
      .localCheckpoint() // feeds the activity rollup AND the churn rollup
    val act = lagged
      .groupBy("day")
      .agg(count(lit(1)).as("dau"),
        sum(expr("CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END")).as("n_new"),
        sum(expr("CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END")).as("n_retained"),
        sum(expr("CASE WHEN prev_day IS NOT NULL AND prev_day < day - 1 THEN 1 ELSE 0 END"))
          .as("n_resurrected"))
    val churn = lagged
      .filter(col("next_day").isNull || col("next_day") > col("day") + 1)
      .select(expr("day + 1").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_churned"))
    act.join(churn, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  def growthAccountingQ(events: DataFrame): DataFrame =
    growthAccounting(events).orderBy("day")

  val growthAccountingSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id,
       |         epoch_us(date_trunc('microseconds', ts)) // ${Retention.UsPerDay} AS day
       |  FROM events
       |), lagged AS (
       |  SELECT user_id, day,
       |         lag(day, 1) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
       |         lead(day, 1) OVER (PARTITION BY user_id ORDER BY day) AS next_day
       |  FROM ud
       |), act AS (
       |  SELECT day,
       |         CAST(count(*) AS BIGINT) AS dau,
       |         CAST(sum(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |         CAST(sum(CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       |         CAST(sum(CASE WHEN prev_day IS NOT NULL AND prev_day < day - 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
       |  FROM lagged GROUP BY 1
       |), churn AS (
       |  SELECT day + 1 AS day, CAST(count(*) AS BIGINT) AS n_churned
       |  FROM lagged
       |  WHERE next_day IS NULL OR next_day > day + 1
       |  GROUP BY 1
       |)
       |SELECT COALESCE(a.day, c.day) AS day,
       |       COALESCE(a.dau, 0) AS dau,
       |       COALESCE(a.n_new, 0) AS n_new,
       |       COALESCE(a.n_retained, 0) AS n_retained,
       |       COALESCE(a.n_resurrected, 0) AS n_resurrected,
       |       COALESCE(c.n_churned, 0) AS n_churned
       |FROM act a FULL OUTER JOIN churn c ON a.day = c.day
       |ORDER BY day""".stripMargin
}
