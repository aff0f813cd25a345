package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-user CONTRIBUTION BOUNDING — the pre-aggregation step of every
  * user-level privacy / robustness pipeline (DP-SQL's "bound each user
  * to k rows", and equally the anti-whale guard in engagement metrics):
  * keep each user's FIRST k events (event-time order, event_id
  * tie-break — deterministic under duplicates), then aggregate per
  * event_type with the dropped mass reported alongside, so the consumer
  * can see exactly what the cap cost. (Reference aggregation surface:
  * read_gold.py's per-group stats; the cap is the standard
  * sensitivity-bounding layer over it.)
  *
  * One scan: the keep/drop verdict and the aggregation read the SAME
  * windowed frame — kept/dropped/cents are conditional sums over the
  * rank, not a second pass joined back. Two exchanges total: user_id
  * for the rank window, event_type for the rollup (|event types| rows).
  * Money is exact BIGINT cents (§6); means stay in integer-ppm form
  * downstream conventions handle — none emitted here.
  */
object ContributionCap {

  /** Max events one user may contribute. */
  val K = 20

  def contributionCap(events: DataFrame, k: Int = K): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(w))
      .groupBy("event_type")
      .agg(
        sum(expr(s"CASE WHEN rn <= $k THEN 1 ELSE 0 END")).as("n_kept"),
        sum(expr(s"CASE WHEN rn > $k THEN 1 ELSE 0 END")).as("n_dropped"),
        sum(expr(s"CASE WHEN rn <= $k THEN cents ELSE 0 END")).as("kept_cents"),
        countDistinct(expr(s"CASE WHEN rn <= $k THEN user_id END")).as("n_users"))
  }

  def contributionCapQ(events: DataFrame): DataFrame =
    contributionCap(events).orderBy("event_type")

  val contributionCapSql: String =
    s"""WITH ranked AS (
       |  SELECT event_type, user_id,
       |         CAST(round(value * 100.0) AS BIGINT) AS cents,
       |         row_number() OVER (PARTITION BY user_id
       |           ORDER BY date_trunc('microseconds', ts), event_id) AS rn
       |  FROM events
       |)
       |SELECT event_type,
       |       CAST(sum(CASE WHEN rn <= $K THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN rn > $K THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |       CAST(sum(CASE WHEN rn <= $K THEN cents ELSE 0 END) AS BIGINT) AS kept_cents,
       |       count(DISTINCT CASE WHEN rn <= $K THEN user_id END) AS n_users
       |FROM ranked
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
}
