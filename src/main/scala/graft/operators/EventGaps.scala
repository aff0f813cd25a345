package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EVENT-STREAM COVERAGE GAPS (round 13) — the completeness audit the
  * ingestion family implies: [[LateArrival]] sizes watermark delay,
  * [[EventDedup]] repairs double delivery; this answers the opposite
  * failure — "did the pipeline DROP a window of time entirely"
  * (collector outage, missed backfill partition). Per event type, at
  * hour granularity: the dense expected axis between the type's first
  * and last observed hour, the hours with NO events, and those missing
  * hours merged into MAXIMAL OUTAGE RUNS (gaps-and-islands — the
  * [[ActivityStreaks]] algebra on the complement set). One row per
  * type always — a clean stream reports zeros, not absence (the
  * expectations_report convention: an audit's all-clear must be a row
  * you can hash, or silence is indistinguishable from not running).
  *
  * §6: all counts BIGINT; hours are integer µs-epoch div; no floats.
  * Scale shape: ONE data-volume aggregation (map-combinable hourly
  * counts, the only stage that touches events); the span agg,
  * densification (sequence INLINE at the generator), anti-join to the
  * missing set, islands window and run rollup all run on
  * |types|×|hours| rows; the final per-type join is catalog-sized. */
object EventGaps {

  private val UsPerHour = 3600000000L

  def eventGaps(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), expr(s"unix_micros(ts) div $UsPerHour").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
      .localCheckpoint() // 2 consumers: span agg + the missing-hour anti join
    val span = hourly.groupBy("event_type")
      .agg(min("hr").as("first_hr"), max("hr").as("last_hr"),
        count(lit(1)).as("n_observed"))
      .localCheckpoint() // 2 consumers: densification + the final report join
    val missing = span
      .select(col("event_type"), explode(expr("sequence(first_hr, last_hr)")).as("hr"))
      .join(hourly, Seq("event_type", "hr"), "left_anti")
    val byHr = Window.partitionBy("event_type").orderBy("hr")
    val runs = missing
      .withColumn("grp", col("hr") - row_number().over(byHr))
      .groupBy("event_type", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gap_runs"),
        sum("len").as("n_missing"),
        max("len").as("max_gap_hours"))
    span.join(runs, Seq("event_type"), "left")
      .select(col("event_type"), col("first_hr"), col("last_hr"),
        (col("last_hr") - col("first_hr") + 1L).as("n_expected"),
        col("n_observed"),
        coalesce(col("n_missing"), lit(0L)).as("n_missing"),
        coalesce(col("n_gap_runs"), lit(0L)).as("n_gap_runs"),
        coalesce(col("max_gap_hours"), lit(0L)).as("max_gap_hours"))
  }

  def eventGapsQ(events: DataFrame): DataFrame =
    eventGaps(events).orderBy("event_type")

  val eventGapsSql: String =
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_us(date_trunc('microseconds', ts)) // $UsPerHour AS hr,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2
       |), span AS (
       |  SELECT event_type, min(hr) AS first_hr, max(hr) AS last_hr,
       |         CAST(count(*) AS BIGINT) AS n_observed
       |  FROM hourly GROUP BY 1
       |), missing AS (
       |  SELECT s.event_type, ax.hr
       |  FROM span s
       |  CROSS JOIN LATERAL (SELECT unnest(range(s.first_hr, s.last_hr + 1)) AS hr) ax
       |  WHERE NOT EXISTS (SELECT 1 FROM hourly h
       |                    WHERE h.event_type = s.event_type AND h.hr = ax.hr)
       |), runs AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS len
       |  FROM (SELECT event_type, hr,
       |               hr - row_number() OVER (PARTITION BY event_type ORDER BY hr) AS grp
       |        FROM missing)
       |  GROUP BY event_type, grp
       |), rollup_runs AS (
       |  SELECT event_type,
       |         CAST(count(*) AS BIGINT) AS n_gap_runs,
       |         CAST(sum(len) AS BIGINT) AS n_missing,
       |         CAST(max(len) AS BIGINT) AS max_gap_hours
       |  FROM runs GROUP BY 1
       |)
       |SELECT s.event_type, s.first_hr, s.last_hr,
       |       s.last_hr - s.first_hr + 1 AS n_expected,
       |       s.n_observed,
       |       COALESCE(r.n_missing, 0) AS n_missing,
       |       COALESCE(r.n_gap_runs, 0) AS n_gap_runs,
       |       COALESCE(r.max_gap_hours, 0) AS max_gap_hours
       |FROM span s LEFT JOIN rollup_runs r ON s.event_type = r.event_type
       |ORDER BY s.event_type""".stripMargin
}
