package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust MAD outlier detection (round 8, continuation) — the
  * median/median-absolute-deviation twin of [[SignalOps.silver]]'s
  * mean/σ z-score gate (|z| > 6, main/silver.py:45-74): mean and σ are
  * themselves dragged by the artifacts they're meant to flag (one
  * electrode spike inflates σ and MASKS smaller spikes — the classic
  * breakdown), while the median/MAD pair has a 50% breakdown point. The
  * standard robust screen a QC pass runs per (trial, channel).
  *
  * The §6 move that makes a MEDIAN-based gate cross-engine exact: every
  * quantity lives in a SCALED INTEGER domain sized so each median is
  * integer-valued by construction. Values ride as doubled cents
  * `c2 = 2·cents` (even), so the group median — either a member or the
  * average of two even members — is an exact integer (`med2`, half-cent
  * units) and the interpolating percentile's double carries it exactly;
  * deviations `d2 = |c2 − med2|` are exact integers; the MAD rides
  * doubled again (`mad4 = median(2·d2)`, quarter-cent units). The gate
  * `|v − med| > K·MAD` becomes the PURE INTEGER compare
  * `2·d2 > K·mad4` — no float constant (the 1.4826 σ-consistency factor
  * is a display convention, not part of the gate), no rounding boundary
  * to flip a verdict. Flat groups (mad4 = 0) flag nothing — the robust
  * analog of silver's σ=0 guard (on a majority-constant group every
  * deviation is "infinitely many σ̂ away"; gating on it would flag half
  * the stream).
  *
  * Scale shape: ONE (user_id, event_type) hash exchange; both exact
  * percentiles run as CHAINED window aggregates over the SAME
  * partitioning (the [[Funnel]] pattern — the second percentile's input
  * is derived from the first's output; Catalyst stacks the Window
  * operators over one exchange, spec-pinned), so no group-agg +
  * join-back round trips. Exact percentile over a window holds one
  * group's values per task — bounded by per-(trial,channel) sample
  * counts (seconds × FS), the [[Iir]] per-group-array argument. Output
  * is per-EVENT verdicts (the silver shape), |events| rows.
  */
object RobustOutlier {

  /** MAD multiples before an event is an outlier (the robust 6σ). */
  val K = 6L

  def eventOutlierMad(events: DataFrame, k: Long = K): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("CAST(round(value * 100.0) AS BIGINT) * 2").as("c2"))
      .withColumn("med2", expr("percentile(c2, 0.5)").over(w).cast("bigint"))
      .withColumn("d2", expr("abs(c2 - med2)"))
      .withColumn("mad4", expr("percentile(d2 * 2, 0.5)").over(w).cast("bigint"))
      .withColumn("is_outlier", expr(s"mad4 > 0 AND 2 * d2 > $k * mad4"))
  }

  def eventOutlierMadQ(events: DataFrame): DataFrame =
    eventOutlierMad(events)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c2"), col("med2"), col("d2"), col("mad4"), col("is_outlier"))
      .orderBy("event_id")

  /** DuckDB twin: the same doubled-integer algebra via two group-median
    * CTEs + join-backs (the oracle's shape need not mirror the plan). */
  val eventOutlierMadSql: String =
    s"""WITH base AS (
       |  SELECT event_id, user_id, event_type,
       |         CAST(round(value * 100.0) AS BIGINT) * 2 AS c2
       |  FROM events
       |), g1 AS (
       |  SELECT user_id, event_type,
       |         CAST(quantile_cont(c2, 0.5) AS BIGINT) AS med2
       |  FROM base GROUP BY 1, 2
       |), d AS (
       |  SELECT b.*, g1.med2, abs(b.c2 - g1.med2) AS d2
       |  FROM base b JOIN g1 USING (user_id, event_type)
       |), g2 AS (
       |  SELECT user_id, event_type,
       |         CAST(quantile_cont(d2 * 2, 0.5) AS BIGINT) AS mad4
       |  FROM d GROUP BY 1, 2
       |)
       |SELECT d.event_id, d.user_id, d.event_type, d.c2, d.med2, d.d2, g2.mad4,
       |       (g2.mad4 > 0 AND 2 * d.d2 > $K * g2.mad4) AS is_outlier
       |FROM d JOIN g2 USING (user_id, event_type)
       |ORDER BY d.event_id""".stripMargin
}
