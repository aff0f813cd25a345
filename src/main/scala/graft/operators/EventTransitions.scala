package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-type TRANSITION MATRIX (round 8, continuation) — first-order
  * path analytics over per-user event streams: how often does `view`
  * lead to `click`, where do sessions START, which state bleeds into
  * `error`. [[Funnel]] checks ONE fixed stage sequence; this is the
  * unordered complement — the full empirical Markov matrix a product
  * analyst reads to DISCOVER which funnels exist, with a synthetic
  * `_start` state so entry distribution falls out of the same rollup.
  *
  * Cross-engine exactness (§6): ordering within a user is the total
  * (ts, event_id) key — event_id breaks equal-timestamp ties, so lag()
  * sees the same predecessor on both engines (integer-µs compare; the
  * [[Sessionize]] contract). Transition shares are integer ppm:
  * `n · 10⁶ div Σ n over the same prev state` via a window sum — exact
  * BIGINT division on both engines.
  *
  * Scale shape: ONE user-keyed exchange for the lag window (narrow rows:
  * user, µs, type), then a map-side-combinable (prev, curr) count — the
  * matrix is |states|² ≤ catalog², driver-irrelevant, and the share
  * window runs over those ≤ catalog² rows. The same shape holds at any
  * event volume; only the first exchange scales with data.
  */
object EventTransitions {

  val StartState = "_start"

  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("event_type"))
      .withColumn("prev_type",
        coalesce(lag(col("event_type"), 1).over(w), lit(StartState)))
    val counts = pairs
      .withColumnRenamed("event_type", "curr_type")
      .groupBy("prev_type", "curr_type")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("row_total",
        sum("n").over(Window.partitionBy("prev_type")))
      .withColumn("share_ppm", expr("n * 1000000 div row_total"))
      .select(col("prev_type"), col("curr_type"), col("n"), col("share_ppm"))
      .orderBy("prev_type", "curr_type")
  }

  def eventTransitionsQ(events: DataFrame): DataFrame =
    eventTransitions(events)

  val eventTransitionsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id,
       |         epoch_us(date_trunc('microseconds', ts)) AS us,
       |         event_type
       |  FROM events
       |), p AS (
       |  SELECT COALESCE(lag(event_type) OVER (PARTITION BY user_id
       |                                        ORDER BY us, event_id),
       |                  '$StartState') AS prev_type,
       |         event_type AS curr_type
       |  FROM e
       |), c AS (
       |  SELECT prev_type, curr_type, CAST(count(*) AS BIGINT) AS n
       |  FROM p GROUP BY 1, 2
       |)
       |SELECT prev_type, curr_type, n,
       |       n * 1000000 // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS share_ppm
       |FROM c
       |ORDER BY prev_type, curr_type""".stripMargin
}
