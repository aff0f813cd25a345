package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EVENT DELIVERY-DEDUP report (round 8, continuation 5) — the
  * at-least-once repair every event pipeline runs before analytics:
  * events identical in (user_id, event_type, ts, value) are delivery
  * retries of one logical event (distinct event_ids — the broker
  * re-stamped them, which is exactly why [[TextOps]]-style exact-id
  * dedup can't catch them); keep the MIN event_id per content key,
  * report the drop mass per type. The verdict-stream form of the
  * documents-side exact dedup (#27), on the table every downstream
  * event operator (#18/#76/#98/...) assumes was already repaired.
  *
  * Cross-engine exactness (SURVEY §6): the content key uses integer-µs
  * time and exact cents (never raw DOUBLE equality — two engines'
  * float render of 490.02 differs, its cents do not); min(event_id)
  * is the family's deterministic survivor rule; dup_ppm integer with
  * the greatest-1 guard.
  *
  * Scale shape: ONE content-keyed aggregation collapses the stream
  * (map-side combinable count+min), then a |types|-sized rollup —
  * dedup-early, no windows, no self-join. At 100 TB this is the same
  * one-shuffle shape as doc fingerprint dedup; the streaming twin is
  * `dropDuplicates` over the state store (the #27 twin's contract).
  */
object EventDedup {

  def eventDedupReport(events: DataFrame): DataFrame = {
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      .groupBy("user_id", "event_type", "t_us", "cents")
      .agg(count(lit(1)).as("n"), min("event_id").as("keeper"))
      .groupBy("event_type")
      .agg(sum("n").as("n_events"),
        count(lit(1)).as("n_logical"),
        sum(expr("n - 1")).as("n_dropped"))
      .select(col("event_type"), col("n_events"), col("n_logical"),
        col("n_dropped"),
        expr("n_dropped * 1000000 div greatest(n_events, 1)").as("dup_ppm"))
  }

  def eventDedupReportQ(events: DataFrame): DataFrame =
    eventDedupReport(events).orderBy("event_type")

  val eventDedupReportSql: String =
    """WITH keyed AS (
      |  SELECT user_id, event_type,
      |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
      |         CAST(round(value * 100.0) AS BIGINT) AS cents,
      |         CAST(count(*) AS BIGINT) AS n,
      |         min(event_id) AS keeper
      |  FROM events
      |  GROUP BY 1, 2, 3, 4
      |)
      |SELECT event_type,
      |       CAST(sum(n) AS BIGINT) AS n_events,
      |       CAST(count(*) AS BIGINT) AS n_logical,
      |       CAST(sum(n - 1) AS BIGINT) AS n_dropped,
      |       CAST(sum(n - 1) AS BIGINT) * 1000000 // greatest(CAST(sum(n) AS BIGINT), 1) AS dup_ppm
      |FROM keyed
      |GROUP BY 1
      |ORDER BY event_type""".stripMargin
}
