package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LAST-TOUCH conversion attribution (round 8, continuation) — every
  * purchase credited to the user's most recent prior touch (view or
  * click), rolled up per channel with conversion counts, value mass and
  * ppm share. The business twin of [[Sessionize.asofJoin]]: same
  * tagged-union + LOCF window mechanics (no range join, no cross join),
  * but the as-of carries the TOUCH TYPE and the result is the
  * marketing-attribution report. Purchases with no prior touch land in
  * the explicit `_none` channel — dropping them silently overstates
  * every real channel's share.
  *
  * Cross-engine exactness (§6): integer µs ordering with the
  * (t_us, side, event_id) tie-break — touches sort before a same-instant
  * purchase, so a zero-latency touch attributes, identically in both
  * engines; value rides as integer cents; shares are integer ppm of the
  * 1-row conversion total (documented broadcast-fact nested loop).
  *
  * Scale shape: one (user_id)-partitioned LOCF window over the filtered
  * touch+purchase stream — a single exchange — then a
  * map-side-combinable channel rollup (≤ |touch types| + 1 rows).
  */
object Attribution {

  def attributionLastTouch(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("side"),
        col("event_type"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t_us"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val roll = tagged
      .withColumn("channel", coalesce(
        last(when(col("side") === 0, col("event_type")), ignoreNulls = true).over(w),
        lit("_none")))
      .filter(col("side") === 1)
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conversions"), sum("cents").as("value_cents"))
    val tot = roll.agg(coalesce(sum("n_conversions"), lit(0L)).as("total"))
    roll.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("n_conversions * 1000000 div greatest(total, 1)"))
      .select(col("channel"), col("n_conversions"), col("value_cents"),
        col("share_ppm"))
  }

  def attributionLastTouchQ(events: DataFrame): DataFrame =
    attributionLastTouch(events).orderBy("channel")

  val attributionLastTouchSql: String =
    s"""WITH tagged AS (
       |  SELECT user_id, event_id,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents,
       |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
       |         event_type
       |  FROM events
       |  WHERE event_type IN ('view', 'click', 'purchase')
       |), locf AS (
       |  SELECT *,
       |         COALESCE(last_value(CASE WHEN side = 0 THEN event_type END IGNORE NULLS)
       |           OVER (PARTITION BY user_id ORDER BY t_us, side, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), '_none') AS channel
       |  FROM tagged
       |), roll AS (
       |  SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
       |         CAST(sum(cents) AS BIGINT) AS value_cents
       |  FROM locf WHERE side = 1 GROUP BY 1
       |), tot AS (
       |  SELECT CAST(COALESCE(sum(n_conversions), 0) AS BIGINT) AS total FROM roll
       |)
       |SELECT channel, n_conversions, value_cents,
       |       n_conversions * 1000000 // greatest(total, 1) AS share_ppm
       |FROM roll CROSS JOIN tot
       |ORDER BY channel""".stripMargin
}
