package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SEASONALITY-AWARE anomaly days (round 15) — the robust gate the
  * series family was reading in two separate pieces: [[RobustOutlier]]
  * flags events against their group's raw median/MAD, but a raw gate on
  * DAILY COUNTS is structurally blind to CALENDAR violations — a
  * Saturday carrying weekday-level traffic has a perfectly ordinary raw
  * value and an enormous deseasonalized one. This runs the
  * [[RobustOutlier]] doubled-integer median/MAD gate on
  * [[SeasonalDecompose]]'s RESIDUAL (trend and day-of-week structure
  * removed — "the right input for outlier eyes", its own doc), per
  * event type, per day: `is_anomaly ⟺ mad4 > 0 ∧ 2·d2 > K·mad4`.
  *
  * §6: resid_milli is already an exact integer (the reconstruction
  * identity); it rides doubled (`r2`, even) so the per-type median is
  * an exact integer, deviations are exact, and the MAD rides doubled
  * again — the gate is a pure integer compare, no float constant, no
  * rounding boundary (the RobustOutlier algebra verbatim). Flat
  * residual series (mad4 = 0) flag nothing — the σ=0 guard.
  *
  * Stated corner (inherited from the decompose's partial-edge trend
  * windows, its own stated corner): the first/last ≤3 days of a
  * type's span average shortened windows, so their residuals carry
  * real edge artifacts that can clear the gate — a consumer reading
  * anomalies near the series edge should know they may be the edge,
  * not the data (spec pins the planted fixture's interior days clean
  * while edge days are allowed to flag).
  *
  * Scale shape: everything data-volume lives inside
  * [[SeasonalDecompose.seasonalDecompose]] (one map-combinable daily
  * agg); the two exact percentiles are CHAINED window aggregates over
  * the SAME type-keyed partitioning of the |types|×|days| dense frame —
  * calendar-bounded partitions (the seasonal/acf window class), never
  * data-bounded. Spec pins the load-bearing claim: a planted
  * weekend-pattern violation is flagged HERE while the raw daily-count
  * MAD gate provably misses it. */
object SeasonalAnomaly {

  /** MAD multiples before a residual day is anomalous (the robust 6σ —
    * [[RobustOutlier.K]]'s convention). */
  val K = 6L

  def seasonalAnomaly(events: DataFrame, k: Long = K): DataFrame = {
    val w = Window.partitionBy("event_type")
    SeasonalDecompose.seasonalDecompose(events)
      .withColumn("r2", expr("resid_milli * 2"))
      .withColumn("med2", expr("percentile(r2, 0.5)").over(w).cast("bigint"))
      .withColumn("d2", expr("abs(r2 - med2)"))
      .withColumn("mad4", expr("percentile(d2 * 2, 0.5)").over(w).cast("bigint"))
      .withColumn("is_anomaly", expr(s"mad4 > 0 AND 2 * d2 > $k * mad4"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("resid_milli"), col("med2"), col("mad4"), col("is_anomaly"))
  }

  def seasonalAnomalyQ(events: DataFrame): DataFrame =
    seasonalAnomaly(events).orderBy("event_type", "day")

  /** SEASONAL-NAIVE FORECAST (round 15) — the series family's first
    * FORWARD surface (everything else reads the past: trend/acf/ewma/
    * cusum/decompose): per type, the next `Horizon` days' expected
    * counts under the classical additive model,
    * `forecast(b+h) = trend(b) + seasonal((b+h) mod 7)` — last
    * observed trend level + the day-of-week component (the standard
    * seasonal-naive-with-level baseline every forecast eval starts
    * from; anything fancier must beat it). All integer milli units,
    * both components straight from [[SeasonalDecompose]]'s exact
    * machinery. Stated corners: a span shorter than a week has unseen
    * dow classes — their seasonal coalesces to 0 (forecast = level);
    * the level is the PARTIAL-window trend at the last day (the
    * decompose's stated edge convention).
    *
    * Scale: the decompose's one daily agg is the only data-volume
    * stage; the level/seasonal extractions and the |types|×Horizon
    * emission are catalog-sized. */
  val Horizon = 7

  /** The exploded forecast base — per (type, future day, horizon) the
    * LEVEL and the (nullable) seasonal component — shared by
    * [[seasonalForecast]] and [[ForecastBacktest.forecastPlanned]]
    * (one arithmetic, two consumers). */
  private[operators] def forecastComponents(events: DataFrame,
                                            horizon: Int = Horizon): DataFrame = {
    // 2 consumers (level + dow means) per the multi-consumer invariant
    val dec = SeasonalDecompose.seasonalDecompose(events).localCheckpoint()
    val level = dec.groupBy("event_type").agg(max("day").as("b"))
      .join(dec, Seq("event_type"))
      .filter(col("day") === col("b"))
      .select(col("event_type"), col("b"), col("trend_milli"))
    val seas = dec.groupBy(col("event_type"), expr("day % 7").as("dow"))
      .agg(min("seas_milli").as("seas_milli")) // constant per (type,dow)
    level
      .withColumn("horizon",
        explode(expr(s"sequence(CAST(1 AS BIGINT), CAST($horizon AS BIGINT))")))
      .withColumn("day", expr("b + horizon"))
      .withColumn("dow", expr("(b + horizon) % 7"))
      .join(broadcast(seas), Seq("event_type", "dow"), "left")
      .select(col("event_type"), col("day"), col("horizon"),
        col("trend_milli"), col("seas_milli"))
  }

  def seasonalForecast(events: DataFrame, horizon: Int = Horizon): DataFrame =
    forecastComponents(events, horizon)
      .select(col("event_type"), col("day"), col("horizon"),
        expr("trend_milli + coalesce(seas_milli, 0)").as("forecast_milli"))

  def seasonalForecastQ(events: DataFrame): DataFrame =
    seasonalForecast(events).orderBy("event_type", "day")

  /** The forecast tail alone (`level`/`dowm`/`hs`, consuming
    * `sdecomp`/`span`) — composable next to the backtest chain in one
    * WITH (the forecast_planned oracle). */
  private[operators] val forecastTailCtes: String =
    s"""level AS (
       |  SELECT d.event_type, d.day AS b, d.trend_milli
       |  FROM sdecomp d JOIN span s
       |    ON s.event_type = d.event_type AND d.day = s.b
       |), dowm AS (
       |  SELECT event_type, day % 7 AS dow, min(seas_milli) AS seas_milli
       |  FROM sdecomp GROUP BY 1, 2
       |), hs AS (
       |  SELECT unnest(range(1, $Horizon + 1)) AS horizon
       |)""".stripMargin

  /** DuckDB twin: decomposeCtes + the same level/seasonal extraction. */
  val seasonalForecastSql: String =
    s"""WITH ${SeasonalDecompose.decomposeCtes}, $forecastTailCtes
       |SELECT l.event_type, l.b + hs.horizon AS day, hs.horizon,
       |       l.trend_milli + COALESCE(m.seas_milli, 0) AS forecast_milli
       |FROM level l
       |CROSS JOIN hs
       |LEFT JOIN dowm m
       |  ON m.event_type = l.event_type AND m.dow = (l.b + hs.horizon) % 7
       |ORDER BY l.event_type, day""".stripMargin

  /** SEASONAL/TREND STRENGTH (round 16) — the Hyndman STL diagnostics
    * (Wang/Smith/Hyndman 2006, public; `feasts::feat_stl`'s
    * trend_strength/seasonal_strength): per type,
    * `F_T = max(0, 1 − Var(R)/Var(T+R))` and
    * `F_S = max(0, 1 − Var(R)/Var(S+R))` over [[SeasonalDecompose]]'s
    * exact components — the one-number answers to "is this series
    * trend-dominated, calendar-dominated, or noise?" that decide which
    * downstream eyes (trend gates vs seasonal gates vs raw MAD) apply.
    *
    * §6: variances ride the EXACT integer sufficient statistics
    * `n·Σv² − (Σv)²` (= n²·Var, non-negative) over the integer-milli
    * components; the single division casts BIGINT→DOUBLE (IEEE-identical
    * both engines) under the shared round-4 text. `T+R = x·1000 − S` and
    * `S+R = x·1000 − T` — derived by the reconstruction identity, so no
    * extra arithmetic can disagree. Zero-variance denominators (constant
    * series) yield NULL — there is no structure to attribute. Stated
    * bound: Σv² keeps BIGINT exactness to ~3M events/type/day over a
    * 1000-day span (the corpus_report integer-domain convention; beyond
    * it the stats saturate loudly in ANSI mode rather than drift).
    *
    * Scale: the decompose's one daily agg + ONE map-combinable per-type
    * aggregation over the calendar-bounded dense frame. */
  def seasonalStrength(events: DataFrame): DataFrame =
    SeasonalDecompose.seasonalDecompose(events)
      .withColumn("r", col("resid_milli"))
      .withColumn("tr", expr("n_events * 1000 - seas_milli"))
      .withColumn("sr", expr("n_events * 1000 - trend_milli"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum("r").as("s_r"), sum(expr("r * r")).as("s_r2"),
        sum("tr").as("s_tr"), sum(expr("tr * tr")).as("s_tr2"),
        sum("sr").as("s_sr"), sum(expr("sr * sr")).as("s_sr2"))
      .select(col("event_type"), col("n_days"),
        expr("n_days * s_r2 - s_r * s_r").as("varn_r"),
        expr("n_days * s_tr2 - s_tr * s_tr").as("varn_tr"),
        expr("n_days * s_sr2 - s_sr * s_sr").as("varn_sr"))
      .select(col("event_type"), col("n_days"),
        expr("CASE WHEN varn_tr > 0 THEN greatest(0.0, " +
          "1.0 - CAST(varn_r AS DOUBLE) / varn_tr) END").as("f_trend"),
        expr("CASE WHEN varn_sr > 0 THEN greatest(0.0, " +
          "1.0 - CAST(varn_r AS DOUBLE) / varn_sr) END").as("f_seasonal"))

  def seasonalStrengthQ(events: DataFrame): DataFrame =
    seasonalStrength(events)
      .select(col("event_type"), col("n_days"),
        Parity.r("f_trend", 4), Parity.r("f_seasonal", 4))
      .orderBy("event_type")

  /** DuckDB twin: decomposeCtes + the same integer sufficient stats and
    * the same guarded double ratio. */
  val seasonalStrengthSql: String =
    s"""WITH ${SeasonalDecompose.decomposeCtes}, comp AS (
       |  SELECT event_type,
       |         resid_milli AS r,
       |         n_events * 1000 - seas_milli AS tr,
       |         n_events * 1000 - trend_milli AS sr
       |  FROM sdecomp
       |), agg AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |         CAST(sum(r) AS BIGINT) AS s_r,
       |         CAST(sum(r * r) AS BIGINT) AS s_r2,
       |         CAST(sum(tr) AS BIGINT) AS s_tr,
       |         CAST(sum(tr * tr) AS BIGINT) AS s_tr2,
       |         CAST(sum(sr) AS BIGINT) AS s_sr,
       |         CAST(sum(sr * sr) AS BIGINT) AS s_sr2
       |  FROM comp GROUP BY 1
       |), vn AS (
       |  SELECT event_type, n_days,
       |         n_days * s_r2 - s_r * s_r AS varn_r,
       |         n_days * s_tr2 - s_tr * s_tr AS varn_tr,
       |         n_days * s_sr2 - s_sr * s_sr AS varn_sr
       |  FROM agg
       |)
       |SELECT event_type, n_days,
       |       ${Parity.rsql(
             "CASE WHEN varn_tr > 0 THEN greatest(0.0, " +
               "1.0 - CAST(varn_r AS DOUBLE) / varn_tr) END", 4, "f_trend")},
       |       ${Parity.rsql(
             "CASE WHEN varn_sr > 0 THEN greatest(0.0, " +
               "1.0 - CAST(varn_r AS DOUBLE) / varn_sr) END", 4, "f_seasonal")}
       |FROM vn
       |ORDER BY event_type""".stripMargin

  /** DuckDB twin: [[SeasonalDecompose.decomposeCtes]] verbatim + the
    * doubled-integer median/MAD algebra as group CTEs + join-backs
    * (the eventOutlierMad oracle shape). */
  val seasonalAnomalySql: String =
    s"""WITH ${SeasonalDecompose.decomposeCtes}, r AS (
       |  SELECT event_type, day, n_events, resid_milli,
       |         resid_milli * 2 AS r2
       |  FROM sdecomp
       |), g1 AS (
       |  SELECT event_type, CAST(quantile_cont(r2, 0.5) AS BIGINT) AS med2
       |  FROM r GROUP BY 1
       |), d AS (
       |  SELECT r.*, g1.med2, abs(r.r2 - g1.med2) AS d2
       |  FROM r JOIN g1 USING (event_type)
       |), g2 AS (
       |  SELECT event_type, CAST(quantile_cont(d2 * 2, 0.5) AS BIGINT) AS mad4
       |  FROM d GROUP BY 1
       |)
       |SELECT d.event_type, d.day, d.n_events, d.resid_milli, d.med2, g2.mad4,
       |       (g2.mad4 > 0 AND 2 * d.d2 > $K * g2.mad4) AS is_anomaly
       |FROM d JOIN g2 USING (event_type)
       |ORDER BY d.event_type, d.day""".stripMargin
}
