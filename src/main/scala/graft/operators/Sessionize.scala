package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Event-stream analytics on `events` (SURVEY.md §2.B 18/19): gaps-and-
  * islands sessionization and an as-of (most-recent-prior) join — the two
  * standard shapes the reference's incremental ingest/analysis layer leans
  * on for event data.
  *
  * Scale notes: both operators are one hash shuffle on user_id followed by
  * a per-user sort — the same (partition, order) pair serves the lag, the
  * running sum, and the LOCF window, so Catalyst plans a single exchange +
  * sort. The as-of join is the union+LOCF formulation: no range/cross join,
  * cost is linear in |left| + |right| after the shuffle.
  *
  * Oracle parity: all times are integer microseconds; values ride as exact
  * integer cents where summed. Window frames are spelled ROWS explicitly —
  * the default RANGE frame treats ties differently across engines.
  */
object Sessionize {

  /** Session gap: a new session starts after > 6 h of inactivity. (The
    * SURVEY sketch said 30 min; this table averages ~10 h between events
    * per user, which would make every event its own session — 6 h yields
    * real multi-event sessions. Same operator, different constant.) */
  val GapUs: Long = 6L * 3600 * 1000000

  /** Events tagged with their session_seq — the shared stage under the
    * rollup ([[sessionize]]) and the path miner ([[SessionPath]]); one
    * definition so the gap rule cannot drift between consumers. */
  private[graft] def sessionTagged(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("c"))
      .withColumn("prev_us", lag("t_us", 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("t_us") - col("prev_us") > GapUs, 1).otherwise(0))
      .withColumn("session_seq", sum("is_new").over(wRun))
  }

  def sessionize(events: DataFrame): DataFrame = {
    sessionTagged(events)
      .groupBy("user_id", "session_seq")
      .agg(
        min("t_us").as("session_start_us"),
        max("t_us").as("session_end_us"),
        count(lit(1)).as("n_events"),
        countDistinct("event_type").as("n_types"),
        sum("c").as("sum_c"))
      .withColumn("duration_sec",
        expr("CAST(session_end_us - session_start_us AS DOUBLE) / 1000000.0"))
      .withColumn("sum_value", expr("CAST(sum_c AS DOUBLE) / 100.0"))
  }

  def sessionizeQ(events: DataFrame): DataFrame =
    sessionize(events)
      .select(col("user_id"), col("session_seq"), col("session_start_us"),
        col("session_end_us"), r("duration_sec", 6), col("n_events"),
        col("n_types"), r("sum_value", 2))
      .orderBy("user_id", "session_seq")

  /** NATIVE twin (round 9) — the same sessions through Spark's own
    * `session_window` aggregate instead of the lag/running-sum window
    * algebra above: Catalyst's dedicated SessionWindow node does the
    * merge, and the output is projected back to this operator's exact
    * contract. Two mappings make the twin bit-identical (spec-pinned,
    * shares [[sessionizeSql]]):
    *
    *  - BOUNDARY: the hand-rolled rule keeps an event in-session at
    *    `t − prev ≤ gap` (strictly-greater splits). `session_window`'s
    *    end is INCLUSIVE — an event at exactly `prev + gap` merges
    *    (pinned by the boundary fixture in SessionNativeSpec) — so the
    *    native gap is `GapUs` verbatim: both forms split strictly
    *    beyond the gap.
    *  - EDGES: session_window.start = min event ts; .end = max event
    *    ts + gap, so `session_end_us = unix_micros(end) − GapUs`.
    *    `session_seq` (not carried by the native node) is a per-user
    *    row_number over window start — partitions are session-sized.
    */
  def sessionizeNative(events: DataFrame): DataFrame = {
    val nativeGap = GapUs
    val seq = Window.partitionBy("user_id").orderBy(col("session_start_us"))
    events
      .select(col("user_id"), col("ts"), col("event_type"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("c"))
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$nativeGap microseconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct("event_type").as("n_types"),
        sum("c").as("sum_c"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        (unix_micros(col("w.end")) - nativeGap).as("session_end_us"),
        col("n_events"), col("n_types"), col("sum_c"))
      .withColumn("session_seq", row_number().over(seq).cast("long"))
      .withColumn("duration_sec",
        expr("CAST(session_end_us - session_start_us AS DOUBLE) / 1000000.0"))
      .withColumn("sum_value", expr("CAST(sum_c AS DOUBLE) / 100.0"))
  }

  /** Registered form — same projection/order as [[sessionizeQ]], same
    * oracle. */
  def sessionizeNativeQ(events: DataFrame): DataFrame =
    sessionizeNative(events)
      .select(col("user_id"), col("session_seq"), col("session_start_us"),
        col("session_end_us"), r("duration_sec", 6), col("n_events"),
        col("n_types"), r("sum_value", 2))
      .orderBy("user_id", "session_seq")

  /** Shared CTE chain ending in `sess` — nested by [[sessionizeSql]] and
    * [[IntervalJoin.intervalJoinSql]] so the session definition cannot
    * drift between the rollup and the containment-join consumer. */
  /** CTE chain ending in `s3` (session-tagged events) — the SQL twin of
    * [[sessionTagged]], nested by [[sessionCtes]] and
    * [[SessionPath.sessionPathSql]]. */
  private[graft] val sessionTagCtes: String =
    s"""ev AS (
       |  SELECT user_id, event_id, event_type,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
       |         CAST(round(value * 100.0) AS BIGINT) AS c
       |  FROM events
       |), s1 AS (
       |  SELECT *, lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_us
       |  FROM ev
       |), s2 AS (
       |  SELECT *, CASE WHEN prev_us IS NULL OR t_us - prev_us > $GapUs THEN 1 ELSE 0 END AS is_new
       |  FROM s1
       |), s3 AS (
       |  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us, event_id
       |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
       |  FROM s2
       |)""".stripMargin

  private[graft] val sessionCtes: String =
    s"""$sessionTagCtes, sess AS (
       |  SELECT user_id, session_seq,
       |         min(t_us) AS session_start_us,
       |         max(t_us) AS session_end_us,
       |         count(*) AS n_events,
       |         count(DISTINCT event_type) AS n_types,
       |         CAST(sum(c) AS DOUBLE) AS sum_c
       |  FROM s3
       |  GROUP BY user_id, session_seq
       |)""".stripMargin

  val sessionizeSql: String =
    s"""WITH $sessionCtes
       |SELECT user_id, session_seq, session_start_us, session_end_us,
       |       ${rsql("(CAST(session_end_us - session_start_us AS DOUBLE) / 1000000.0)", 6, "duration_sec")},
       |       n_events, n_types,
       |       ${rsql("(sum_c / 100.0)", 2, "sum_value")}
       |FROM sess
       |ORDER BY user_id, session_seq""".stripMargin

  // -------------------------------------------------------------- asof_join

  /** As-of join: for every 'click' event, the most recent prior-or-equal
    * 'purchase' by the same user, via tagged union + last-ignore-nulls LOCF
    * window (purchases sort before clicks at equal timestamps). No range or
    * cross join — linear after the user_id shuffle. */
  def asofJoin(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t_us"), col("value"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"))
    val w = Window.partitionBy("user_id").orderBy("t_us", "side", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_purchase_us",
        last(when(col("side") === 0, col("t_us")), ignoreNulls = true).over(w))
      .withColumn("last_purchase_value",
        last(when(col("side") === 0, col("value")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select("user_id", "event_id", "t_us", "value",
        "last_purchase_us", "last_purchase_value")
  }

  def asofJoinQ(events: DataFrame): DataFrame =
    asofJoin(events).orderBy("user_id", "t_us", "event_id")

  val asofJoinSql: String =
    s"""WITH tagged AS (
       |  SELECT user_id, event_id,
       |         epoch_us(date_trunc('microseconds', ts)) AS t_us,
       |         value,
       |         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
       |  FROM events
       |  WHERE event_type IN ('click', 'purchase')
       |), locf AS (
       |  SELECT *,
       |         last_value(CASE WHEN side = 0 THEN t_us END IGNORE NULLS)
       |           OVER (PARTITION BY user_id ORDER BY t_us, side, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_us,
       |         last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS)
       |           OVER (PARTITION BY user_id ORDER BY t_us, side, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
       |  FROM tagged
       |)
       |SELECT user_id, event_id, t_us, value, last_purchase_us, last_purchase_value
       |FROM locf
       |WHERE side = 1
       |ORDER BY user_id, t_us, event_id""".stripMargin
}
