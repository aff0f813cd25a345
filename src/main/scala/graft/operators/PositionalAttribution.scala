package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** POSITIONAL (U-shaped) multi-touch attribution (round 8,
  * continuation 5) — [[Attribution]]'s multi-touch sibling: each
  * purchase's value splits across ALL its preceding touches since the
  * previous purchase — 40% first touch, 40% last, 20% spread over the
  * middles (the standard U/position model; 50/50 at two touches, all
  * to the only touch at one, `_none` at zero). What last-touch hides
  * is exactly what this measures: the prospecting channel that opens
  * journeys but never closes them.
  *
  * Cross-engine exactness (SURVEY §6): credits are integer cents —
  * `first = v·4 div 10`, `last = v·4 div 10`, each middle
  * `(v − first − last) div (m−2)` — and the DIVISION REMAINDER is
  * assigned to the last touch, making conservation EXACT by
  * construction: Σ credited (incl. `_none`) ≡ Σ purchase cents, a
  * spec-pinned invariant, not a rounding hope. Touch-to-purchase
  * assignment is the remaining-purchases trick: `p_rem = Σ side over
  * (current row → end)` in the (t_us, side, event_id) total order —
  * a purchase and exactly its journey's touches share (user, p_rem);
  * touches after the final purchase have p_rem = 0 and credit nobody.
  *
  * Scale shape: one user-keyed FOLLOWING-frame window assigns groups,
  * one (user, journey) window ranks touches (second exchange, over
  * the same filtered stream), then a |channels|-sized rollup. No
  * joins, no per-purchase re-scan.
  */
object PositionalAttribution {

  def attributionPositional(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("side"),
        col("event_type"))
    val wFwd = Window.partitionBy("user_id")
      .orderBy(col("t_us"), col("side"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val grouped = tagged
      .withColumn("p_rem", sum("side").over(wFwd))
      .filter(col("p_rem") > 0)
    val wj = Window.partitionBy("user_id", "p_rem")
    val wjOrd = wj.orderBy(col("t_us"), col("side"), col("event_id"))
    val journey = grouped
      .withColumn("m", sum(expr("1 - side")).over(wj))
      .withColumn("v", max(when(col("side") === 1, col("cents"))).over(wj))
      .withColumn("rn", row_number().over(wjOrd))
    val credited = journey.withColumn("credit", expr(
      """CASE
        |  WHEN side = 1 THEN CASE WHEN m = 0 THEN v ELSE 0 END
        |  WHEN m = 1 THEN v
        |  WHEN m = 2 THEN CASE WHEN rn = 1 THEN v div 2 ELSE v - v div 2 END
        |  WHEN rn = 1 THEN (v * 4) div 10
        |  WHEN rn = m THEN v - (v * 4) div 10
        |                 - ((v - 2 * ((v * 4) div 10)) div (m - 2)) * (m - 2)
        |  ELSE (v - 2 * ((v * 4) div 10)) div (m - 2)
        |END""".stripMargin))
    credited
      .withColumn("channel",
        when(col("side") === 1, lit("_none")).otherwise(col("event_type")))
      .filter(col("credit") > 0 || (col("side") === 0))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_touches"), sum("credit").as("credited_cents"))
  }

  def attributionPositionalQ(events: DataFrame): DataFrame =
    attributionPositional(events).orderBy("channel")

  val attributionPositionalSql: String =
    """WITH tagged AS (
      |  SELECT user_id, event_id,
      |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
      |         CAST(round(value * 100.0) AS BIGINT) AS cents,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
      |         event_type
      |  FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')
      |), grouped AS (
      |  SELECT *,
      |         CAST(sum(side) OVER (PARTITION BY user_id
      |           ORDER BY t_us, side, event_id
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS p_rem
      |  FROM tagged
      |), inj AS (
      |  SELECT * FROM grouped WHERE p_rem > 0
      |), journey AS (
      |  SELECT *,
      |         CAST(sum(1 - side) OVER (PARTITION BY user_id, p_rem) AS BIGINT) AS m,
      |         max(CASE WHEN side = 1 THEN cents END)
      |           OVER (PARTITION BY user_id, p_rem) AS v,
      |         row_number() OVER (PARTITION BY user_id, p_rem
      |           ORDER BY t_us, side, event_id) AS rn
      |  FROM inj
      |), credited AS (
      |  SELECT *,
      |         CASE
      |           WHEN side = 1 THEN CASE WHEN m = 0 THEN v ELSE 0 END
      |           WHEN m = 1 THEN v
      |           WHEN m = 2 THEN CASE WHEN rn = 1 THEN v // 2 ELSE v - v // 2 END
      |           WHEN rn = 1 THEN (v * 4) // 10
      |           WHEN rn = m THEN v - (v * 4) // 10
      |                          - ((v - 2 * ((v * 4) // 10)) // (m - 2)) * (m - 2)
      |           ELSE (v - 2 * ((v * 4) // 10)) // (m - 2)
      |         END AS credit
      |  FROM journey
      |)
      |SELECT CASE WHEN side = 1 THEN '_none' ELSE event_type END AS channel,
      |       CAST(count(*) AS BIGINT) AS n_touches,
      |       CAST(sum(credit) AS BIGINT) AS credited_cents
      |FROM credited
      |WHERE credit > 0 OR side = 0
      |GROUP BY 1
      |ORDER BY channel""".stripMargin
}
