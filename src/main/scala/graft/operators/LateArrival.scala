package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LATE-ARRIVAL audit (round 8, continuation 5) — how out-of-order the
  * event stream actually is: per type, events whose event time is
  * BEHIND the per-user high-watermark at their arrival position
  * (arrival = event_id order, the ingest sequence), with the maximum
  * and total lateness. THE watermark-sizing diagnostic for the
  * Structured Streaming twins (§D): the `withWatermark` delay every
  * streaming job picks, and the out-of-order contract the sessionize/
  * as-of twins spec-pin, should be read off exactly this report — a
  * max_late of 40 s says a 1-minute watermark loses nothing, says it
  * from data, and says it per type (delivery paths differ).
  *
  * Cross-engine exactness (SURVEY §6): integer-µs event time; the
  * running high-watermark is `max(t_us)` over the per-user PRECEDING
  * frame in (event_id) arrival order — a total order, so the frame
  * content is engine-independent; lateness = exact nonneg µs deltas;
  * ppm with the greatest-1 guard.
  *
  * Scale shape: ONE user-keyed window exchange (running max over
  * rows-preceding), one |types|-sized combinable rollup. No joins.
  */
object LateArrival {

  def lateArrivalAudit(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("hwm", max("t_us").over(w))
      .withColumn("late_us",
        expr("CASE WHEN hwm IS NOT NULL AND hwm > t_us THEN hwm - t_us ELSE 0 END"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CASE WHEN late_us > 0 THEN 1 ELSE 0 END")).as("n_late"),
        max("late_us").as("max_late_us"),
        sum("late_us").as("sum_late_us"))
      .select(col("event_type"), col("n_events"), col("n_late"),
        expr("n_late * 1000000 div greatest(n_events, 1)").as("late_ppm"),
        col("max_late_us"), col("sum_late_us"))
  }

  def lateArrivalAuditQ(events: DataFrame): DataFrame =
    lateArrivalAudit(events).orderBy("event_type")

  /** JOB-LEVEL watermark sizing: per type, the maximum lateness vs the
    * GLOBAL arrival high-watermark — the statistic a Structured
    * Streaming `withWatermark` actually compares against (the per-user
    * audit above bounds per-KEY state correctness; a job's watermark is
    * global, so an event can be behind the global max by far more than
    * behind its own user's). `max(max_behind_us)` over this report + a
    * margin IS the delay at which the streaming twins drop zero events
    * — WatermarkSpec derives it and proves both directions.
    *
    * Scale note: the global prefix-max window is deliberately
    * unpartitioned — the statistic is inherently a sequential scan of
    * the arrival order. This is a per-shard/per-day DIAGNOSTIC (run it
    * on each ingest partition and take the max), not a registered
    * corpus-wide query; the registered audit stays per-user-keyed. */
  def globalLateness(events: DataFrame): DataFrame = {
    val w = Window.orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("t_us"))
      .withColumn("hwm", max("t_us").over(w))
      .withColumn("behind_us",
        expr("CASE WHEN hwm IS NOT NULL AND hwm > t_us THEN hwm - t_us ELSE 0 END"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max("behind_us").as("max_behind_us"))
  }

  val lateArrivalAuditSql: String =
    """WITH marked AS (
      |  SELECT event_type,
      |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
      |         max(epoch_us(date_trunc('microseconds', ts))) OVER
      |           (PARTITION BY user_id ORDER BY event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
      |  FROM events
      |), scored AS (
      |  SELECT event_type,
      |         CASE WHEN hwm IS NOT NULL AND hwm > t_us THEN hwm - t_us ELSE 0 END AS late_us
      |  FROM marked
      |)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
      |         // greatest(CAST(count(*) AS BIGINT), 1) AS late_ppm,
      |       max(late_us) AS max_late_us,
      |       CAST(sum(late_us) AS BIGINT) AS sum_late_us
      |FROM scored
      |GROUP BY 1
      |ORDER BY event_type""".stripMargin
}
