package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's signal pipeline (SURVEY.md §2.A), re-expressed on the
  * `events` table: trial ≈ user_id, channel ≈ event_type, t ≈ ts,
  * value ≈ value.
  *
  * Stages mirror the reference medallion flow:
  *  - bronze ingest: metadata extract + long signal rows + channel whitelist
  *    + dropna (/root/reference/delta_bronze.py:40-78)
  *  - silver z-score: per-(trial,channel) mean/std windows, std=0 guard,
  *    |z|>6 outlier filter (/root/reference/main/silver.py:41-74)
  *  - gold trial stats: per-(trial,channel) count/timing/value/z stats with
  *    exact median and p95 (/root/reference/main/gold.py:40-103)
  *  - epoch features: floor(t/step) epoching, moments, RMS, p2p, zero-
  *    crossing rate via lag sign change, Hjorth activity/mobility/complexity
  *    from lag-diff variances, QC flags (/root/reference/pilots/pilot_gold.py:44-121)
  *  - qc report (/root/reference/read_gold.py:37-45) and channel-pivot wide
  *    feature matrix (/root/reference/test_train.py:49-59)
  *  - FIR band-pass: the scale-out, window-expressible analog of the pandas
  *    Butterworth path (/root/reference/bronze-to-silver.py:19-40)
  *
  * Scale notes (100 TB): the whole pipeline clusters on (trial, channel).
  * bronzeIngest computes the per-trial window FIRST, then the
  * per-(trial,channel) row_number; every later window/agg keys on
  * (trial, channel) or a superset, so hash(trial, channel) satisfies their
  * clustering requirement — one shuffle by trial + one by (trial, channel)
  * feed z-score → epoching → features → QC with no further exchanges. Only
  * the final per-trial pivot re-shuffles (by trial). All stats are
  * single-pass partial aggregates (long/double sums), map-side combinable.
  *
  * Oracle parity (SURVEY.md §6):
  *  - time arithmetic on integer microseconds (unix_micros ↔ epoch_us over
  *    date_trunc('microseconds', ts)) — both engines divide identical longs;
  *  - `value` has 2 decimal digits, so mean/std/var/rms are computed from
  *    EXACT integer-cents sums (sum of longs is exact in both engines, in
  *    any order) and the closed-form sample-variance formula; the formula
  *    TEXT is shared between Spark `expr()` and the DuckDB SQL, so both
  *    engines execute identical double ops on identical inputs → bit-equal
  *    results, immune to summation order and Welford-vs-naive differences;
  *  - skew/kurtosis need 4th powers (cents⁴ overflows int64), so those use
  *    double sums: order-drift ~1e-15 relative on O(1) outputs, absorbed by
  *    round(·,4); `+ 0.0` normalizes -0.0 vs 0.0 after rounding.
  */
object SignalOps {

  /** Channel whitelist — the reference keeps only EXPECTED_CHANNELS
    * (delta_bronze.py:14,76); here every event_type except the 'error'
    * stream. */
  val Channels: Seq[String] = Seq("click", "purchase", "signup", "view")

  val FS = 128.0 // reference sampling rate; kept for duration_from_count parity
  val ZOutlier = 6.0

  /** Epoch geometry. The reference uses 1 s windows with 0.5 s hop at 128 Hz
    * (pilot_gold.py:4-7); events are minutes apart over a month, so the same
    * floor(t/step) epoching runs at step = 7 days, win = 2*step. (Like the
    * reference, win > step means the post-floor window filter is a no-op.) */
  val StepSec = 604800.0
  val WinSec = 1209600.0

  /** highvar QC threshold, scaled to this table's value range (reference
    * uses 100.0 for its EEG scale, pilot_gold.py:118). */
  val HighvarStd = 100.0

  // ----------------------------------------------------- shared formula text
  // Used verbatim by Spark expr() AND interpolated into the DuckDB oracle SQL
  // so both engines run the identical double expression tree.

  /** mean of value from exact cents sum s1c and count cnt_d (both double). */
  private val MeanF = "s1c / (cnt_d * 100.0)"

  /** sample stddev of value from exact cents sums; NULL when n=1. */
  private val StdF =
    "CASE WHEN cnt_d > 1.0 THEN sqrt(greatest((s2c - (s1c * s1c) / cnt_d) / (cnt_d - 1.0), 0.0)) / 100.0 END"

  /** z with std=0/NULL guard (main/silver.py:48-53). */
  private val ZF =
    "CASE WHEN coalesce(std_val, 0.0) = 0.0 THEN 0.0 ELSE (value - mean_val) / std_val END"

  /** sample variance of a cents-scale column pair (s1, s2, exact) back on
    * the value scale; NULL when n=1. */
  private def varF(s1: String, s2: String): String =
    s"CASE WHEN cnt_d > 1.0 THEN (($s2 - ($s1 * $s1) / cnt_d) / (cnt_d - 1.0)) / 10000.0 END"

  /** mean/std of z from double sums (z is bit-identical across engines). */
  private val MeanZF = "sz1 / cnt_d"
  private val StdZF =
    "CASE WHEN cnt_d > 1.0 THEN sqrt(greatest((sz2 - (sz1 * sz1) / cnt_d) / (cnt_d - 1.0), 0.0)) END"

  private val RmsF = "sqrt(s2c / cnt_d) / 100.0"

  /** central moments from raw moments (explicit, identical association order
    * on both sides; SURVEY §6 — Spark/DuckDB builtin skew/kurt differ in
    * bias correction). Moments are on the cents scale; skew/kurtosis are
    * scale-invariant so the result equals the value-scale one. */
  private val M1F = "s1c / cnt_d"
  private val M2cF = "s2c / cnt_d - (s1c / cnt_d) * (s1c / cnt_d)"
  private val SkewF =
    "CASE WHEN m2c > 1e-6 THEN (s3d / cnt_d - 3.0 * m1 * (s2c / cnt_d) + 2.0 * m1 * m1 * m1) / pow(m2c, 1.5) END"
  private val KurtF =
    "CASE WHEN m2c > 1e-6 THEN (s4d / cnt_d - 4.0 * m1 * (s3d / cnt_d) + 6.0 * m1 * m1 * (s2c / cnt_d) - 3.0 * m1 * m1 * m1 * m1) / (m2c * m2c) - 3.0 END"

  private val MobilityF =
    "CASE WHEN coalesce(var_x, 0.0) = 0.0 THEN 0.0 ELSE sqrt(var_dx / var_x) END"
  private val ComplexityF =
    "CASE WHEN coalesce(var_dx, 0.0) = 0.0 THEN 0.0 ELSE sqrt(var_d2x / var_dx) / (CASE WHEN hj_mobility = 0.0 THEN 1.0 ELSE hj_mobility END) END"

  private val FlatlineF = "(p2p <= 1e-6 OR std IS NULL OR std <= 1e-12)"
  private val HighvarF = s"coalesce(std > $HighvarStd, false)"

  // ---------------------------------------------------------------- bronze

  /** Raw events → long signal rows: whitelist + dropna, JSON props field,
    * per-trial time origin (integer µs), per-(trial,channel) sample index,
    * integer-cents twin `c` of value for exact downstream moments. */
  def bronzeIngest(events: DataFrame): DataFrame = {
    val wT = Window.partitionBy("trial_id")
    val wTC = Window.partitionBy("trial_id", "channel").orderBy("ts", "event_id")
    events
      .filter(col("event_type").isin(Channels: _*) && col("value").isNotNull)
      .select(
        col("user_id").as("trial_id"),
        col("event_type").as("channel"),
        col("ts"), col("event_id"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("c", expr("CAST(round(value * 100.0) AS BIGINT)"))
      .withColumn("t_us", unix_micros(col("ts")))
      // per-trial window first: everything after this clusters on
      // (trial, channel) and never re-shuffles
      .withColumn("time_sec", (col("t_us") - min("t_us").over(wT)) / lit(1000000.0))
      .withColumn("sample_idx", row_number().over(wTC) - 1)
      .drop("t_us")
  }

  // ---------------------------------------------------------------- silver

  /** Per-(trial,channel) z-score with std=0/null guard; drops |z| > 6
    * outliers (main/silver.py:45-74). */
  def silverZscore(bronze: DataFrame): DataFrame = {
    val w = Window.partitionBy("trial_id", "channel")
    bronze
      .withColumn("s1c", sum("c").over(w).cast("double"))
      .withColumn("s2c", sum(expr("c * c")).over(w).cast("double"))
      .withColumn("cnt_d", count(lit(1)).over(w).cast("double"))
      .withColumn("mean_val", expr(MeanF))
      .withColumn("std_val", expr(StdF))
      .withColumn("z", expr(ZF))
      .filter(abs(col("z")) <= ZOutlier)
      .drop("s1c", "s2c", "cnt_d", "mean_val", "std_val")
  }

  def silver(events: DataFrame): DataFrame = silverZscore(bronzeIngest(events))

  // ------------------------------------------------------------------ gold

  /** Per-(trial,channel) stats incl. exact median/p95 (main/gold.py:40-103;
    * percentile_approx there, exact percentile here per SURVEY §6). */
  def goldTrialStats(silver: DataFrame): DataFrame =
    silver.groupBy("trial_id", "channel")
      .agg(
        count(lit(1)).as("n_samples"),
        min("time_sec").as("t_start_sec"),
        max("time_sec").as("t_end_sec"),
        sum("c").cast("double").as("s1c"),
        sum(expr("c * c")).cast("double").as("s2c"),
        count(lit(1)).cast("double").as("cnt_d"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        expr("percentile(value, 0.5)").as("median_value"),
        expr("percentile(value, 0.95)").as("p95_value"),
        sum("z").as("sz1"),
        sum(expr("z * z")).as("sz2"),
        min("z").as("min_z"),
        max("z").as("max_z"))
      .withColumn("duration_sec", col("t_end_sec") - col("t_start_sec"))
      .withColumn("duration_from_count_sec", col("n_samples") / lit(FS))
      .withColumn("mean_value", expr(MeanF))
      .withColumn("std_value", expr(StdF))
      // values are strictly positive here, so mean(|v|) = mean(v); computed
      // from the same exact cents sum (gold.py:63 mean_abs_value)
      .withColumn("mean_abs_value", expr(MeanF))
      .withColumn("mean_z", expr(MeanZF))
      .withColumn("std_z", expr(StdZF))
      .withColumn("samples_per_sec",
        expr("CASE WHEN duration_sec > 0 THEN n_samples / duration_sec END"))

  /** Full epoch-feature table: moments + RMS/p2p/zcr + Hjorth + QC flags in
    * ONE aggregation pass (the reference computes stats and Hjorth as two
    * aggs + a join, pilot_gold.py:66-110; both need the same lag pass, so a
    * single grouped agg halves the shuffle work).
    *
    * Zero crossings are counted on the centered z signal (raw values here
    * are strictly positive, so sign(value) never changes; the reference's
    * EEG values oscillate around 0). Lag differences dx/d2x are computed on
    * integer cents (dc/d2c) so their variances are exact as well.
    */
  def epochFeatures(silver: DataFrame): DataFrame = {
    val wSeq = Window.partitionBy("trial_id", "channel", "epoch_id").orderBy("sample_idx")
    val ep = silver
      .withColumn("epoch_id", floor(col("time_sec") / lit(StepSec)).cast("long"))
      .withColumn("win_start_sec", col("epoch_id") * lit(StepSec))
      .withColumn("win_end_sec", col("epoch_id") * lit(StepSec) + lit(WinSec))
      .withColumn("sign", when(col("z") >= 0, 1).otherwise(-1))
      .withColumn("sign_prev", lag("sign", 1).over(wSeq))
      .withColumn("c_prev", lag("c", 1).over(wSeq))
      .withColumn("is_change",
        when(col("sign_prev").isNotNull && col("sign") =!= col("sign_prev"), 1).otherwise(0))
      .withColumn("dc", when(col("c_prev").isNull, 0L).otherwise(col("c") - col("c_prev")))
      .withColumn("dc_prev", lag("dc", 1).over(wSeq))
      .withColumn("d2c", when(col("dc_prev").isNull, 0L).otherwise(col("dc") - col("dc_prev")))

    ep.groupBy("trial_id", "channel", "epoch_id", "win_start_sec", "win_end_sec")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value").isNull, 1).otherwise(0)).as("n_nan"),
        count(lit(1)).cast("double").as("cnt_d"),
        sum("c").cast("double").as("s1c"),
        sum(expr("c * c")).cast("double").as("s2c"),
        sum(expr("CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)")).as("s3d"),
        sum(expr("CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)")).as("s4d"),
        (max("value") - min("value")).as("p2p"),
        sum("is_change").as("zcr_count"),
        sum("dc").cast("double").as("sd1"),
        sum(expr("dc * dc")).cast("double").as("sd2"),
        sum("d2c").cast("double").as("sdd1"),
        sum(expr("d2c * d2c")).cast("double").as("sdd2"))
      .withColumn("mean", expr(MeanF))
      .withColumn("std", expr(StdF))
      .withColumn("rms", expr(RmsF))
      .withColumn("m1", expr(M1F))
      .withColumn("m2c", expr(M2cF))
      .withColumn("skew", expr(SkewF))
      .withColumn("kurtosis", expr(KurtF))
      .withColumn("nan_ratio", expr("CAST(n_nan AS DOUBLE) / n"))
      .withColumn("zcr", expr(s"CAST(zcr_count AS DOUBLE) / $WinSec"))
      .withColumn("var_x", expr(varF("s1c", "s2c")))
      .withColumn("var_dx", expr(varF("sd1", "sd2")))
      .withColumn("var_d2x", expr(varF("sdd1", "sdd2")))
      .withColumn("hj_activity", col("var_x"))
      .withColumn("hj_mobility", expr(MobilityF))
      .withColumn("hj_complexity", expr(ComplexityF))
      .withColumn("flatline_flag", expr(FlatlineF))
      .withColumn("highvar_flag", expr(HighvarF))
  }

  /** Per-(trial,channel) epoch counts + conditional flag sums
    * (read_gold.py:37-45). */
  def qcReport(efeat: DataFrame): DataFrame =
    efeat.groupBy("trial_id", "channel").agg(
      count(lit(1)).as("n_epochs"),
      sum(when(col("flatline_flag"), 1).otherwise(0)).as("n_flat"),
      sum(when(col("highvar_flag"), 1).otherwise(0)).as("n_highvar"))

  val FeatureCols: Seq[String] =
    Seq("mean", "std", "rms", "p2p", "zcr", "hj_mobility", "hj_complexity")

  /** QC-filter → channel-pivot wide per-trial feature matrix
    * (test_train.py:49-59). The reference pivots a pre-averaged
    * (trial,channel) table; avg(CASE WHEN channel=c THEN f END) over epochs
    * is the same value in one shuffle instead of two.
    *
    * Averages are computed as exact long sums of integer micro-units
    * (features are bit-identical across engines, so round(f·1e6) is too)
    * divided by the cell count — summation-order-proof like the cents
    * moments. */
  def featureWide(efeat: DataFrame): DataFrame = {
    val src = FeatureCols.foldLeft(
      efeat.filter(!col("flatline_flag") && !col("highvar_flag") && col("nan_ratio") <= 0.05)
    ) { (df, f) => df.withColumn(s"fi_$f", expr(s"CAST(round($f * 1000000.0) AS BIGINT)")) }
    val aggs = for (ch <- Channels; f <- FeatureCols; a <- Seq("s", "c")) yield {
      val cell = when(col("channel") === ch, col(s"fi_$f"))
      if (a == "s") sum(cell).cast("double").as(s"s_${ch}_$f")
      else count(cell).cast("double").as(s"c_${ch}_$f")
    }
    src.groupBy("trial_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("trial_id") +: (for (ch <- Channels; f <- FeatureCols) yield
        expr(s"s_${ch}_$f / (c_${ch}_$f * 1000000.0)").as(s"${ch}_${f}_avg")): _*)
  }

  // ------------------------------------------------------------------- FIR

  val FirTaps = 49
  val FirF1Hz = 4.0
  val FirF2Hz = 40.0

  /** Hamming-windowed sinc band-pass taps at FS=128
    * (bronze-to-silver.py:19-22 designs a 1–40 Hz Butterworth; an FIR
    * convolution is the shuffle-free windowed-lag-sum analog). The low edge
    * is 4 Hz instead of 1 Hz: a 1 Hz FIR edge at FS=128 needs ~257 taps,
    * while 49 taps at 4 Hz already gives -34 dB at DC with unity passband —
    * the IIR filtfilt operator covers the exact 1–40 Hz band. */
  val FirCoeffs: Seq[Double] = {
    val f1 = FirF1Hz / FS
    val f2 = FirF2Hz / FS
    val m = (FirTaps - 1) / 2.0
    def sinc(x: Double): Double =
      if (x == 0.0) 1.0 else math.sin(math.Pi * x) / (math.Pi * x)
    (0 until FirTaps).map { k =>
      val t = k - m
      val ideal = 2.0 * f2 * sinc(2.0 * f2 * t) - 2.0 * f1 * sinc(2.0 * f1 * t)
      val ham = 0.54 - 0.46 * math.cos(2.0 * math.Pi * k / (FirTaps - 1))
      ideal * ham
    }
  }

  /** Causal FIR convolution as a lag-weighted sum over the per-(trial,
    * channel) sample order. Rows without a full tap history keep a NULL
    * y_bp (NULL lag propagates through the sum identically in both
    * engines), so the operator is total over its input. */
  def firBandpass(bronze: DataFrame): DataFrame = {
    val w = Window.partitionBy("trial_id", "channel").orderBy("sample_idx")
    val terms = FirCoeffs.zipWithIndex.map { case (h, k) =>
      if (k == 0) lit(h) * col("value") else lit(h) * lag("value", k).over(w)
    }
    bronze.withColumn("y_bp", terms.reduce(_ + _))
  }

  // ---------------------------------------------------- presented queries

  // engine-stable rounding (see Parity): cents-exact variances of n=2
  // groups are exact .5 multiples, so the boundary case is frequent here
  import Parity.{r, rexpr, rsql}

  def bronzeIngestQ(events: DataFrame): DataFrame =
    bronzeIngest(events)
      .select(col("trial_id"), col("channel"), col("sample_idx"),
        r("time_sec", 6), col("value"), col("k"))
      .orderBy("trial_id", "channel", "sample_idx")

  def silverZscoreQ(events: DataFrame): DataFrame =
    silver(events)
      .select(col("trial_id"), col("channel"), col("sample_idx"),
        r("time_sec", 6), col("value"), r("z", 4))
      .orderBy("trial_id", "channel", "sample_idx")

  def goldTrialStatsQ(events: DataFrame): DataFrame =
    goldTrialStats(silver(events))
      .select(col("trial_id"), col("channel"), col("n_samples"),
        r("t_start_sec", 6), r("t_end_sec", 6), r("duration_sec", 6),
        r("duration_from_count_sec", 6),
        r("mean_value", 4), r("std_value", 4), r("mean_abs_value", 4),
        col("min_value"), col("max_value"),
        r("median_value", 4), r("p95_value", 4),
        r("mean_z", 4), r("std_z", 4), r("min_z", 4), r("max_z", 4),
        r("samples_per_sec", 10))
      .orderBy("trial_id", "channel")

  def goldEpochFeaturesQ(events: DataFrame): DataFrame =
    epochFeatures(silver(events))
      .select(col("trial_id"), col("channel"), col("epoch_id"),
        col("win_start_sec"), col("win_end_sec"), col("n"), col("n_nan"),
        r("mean", 4), r("std", 4), r("rms", 4), r("p2p", 4),
        r("skew", 4), r("kurtosis", 4), col("zcr_count"), r("zcr", 10),
        r("nan_ratio", 4), col("flatline_flag"), col("highvar_flag"))
      .orderBy("trial_id", "channel", "epoch_id")

  def hjorthFeaturesQ(events: DataFrame): DataFrame =
    epochFeatures(silver(events))
      .select(col("trial_id"), col("channel"), col("epoch_id"),
        r("hj_activity", 4), r("hj_mobility", 4), r("hj_complexity", 4))
      .orderBy("trial_id", "channel", "epoch_id")

  def qcReportQ(events: DataFrame): DataFrame =
    qcReport(epochFeatures(silver(events)))
      .orderBy("trial_id", "channel")

  private def featureWideRounded(events: DataFrame): DataFrame = {
    val rounded = (for (ch <- Channels; f <- FeatureCols)
      yield expr(rexpr(s"${ch}_${f}_avg", 4)).as(s"${ch}_${f}_avg"))
    featureWide(epochFeatures(silver(events)))
      .select(col("trial_id") +: rounded: _*)
  }

  def featureWideQ(events: DataFrame): DataFrame =
    featureWideRounded(events).orderBy("trial_id")

  /** Wide→long unpivot via `stack` — the reference's `stack()` un-pivot of
    * headered per-column CSVs (/root/reference/pilots/pilot_silver.py:71-80),
    * applied to the channel-pivot matrix so pivot→unpivot round-trips.
    * NULL cells (trial had no QC-passing epochs for a channel) are dropped,
    * matching DuckDB UNPIVOT's default. stack is a codegen'd generator —
    * map-only, no shuffle beyond featureWide's own. */
  def featureUnpivot(wide: DataFrame): DataFrame = {
    val arms = (for (ch <- Channels; f <- FeatureCols)
      yield s"'$ch', '$f', ${ch}_${f}_avg").mkString(", ")
    val n = Channels.size * FeatureCols.size
    wide.selectExpr("trial_id", s"stack($n, $arms) AS (channel, feature, avg_value)")
      .filter(col("avg_value").isNotNull)
  }

  def featureUnpivotQ(events: DataFrame): DataFrame =
    featureUnpivot(featureWideRounded(events))
      .orderBy("trial_id", "channel", "feature")

  def firBandpassQ(events: DataFrame): DataFrame =
    firBandpass(bronzeIngest(events))
      .select(col("trial_id"), col("channel"), col("sample_idx"),
        col("value"), r("y_bp", 4))
      .orderBy("trial_id", "channel", "sample_idx")

  // ------------------------------------------------------------ oracle SQL

  private val channelsIn = Channels.map(c => s"'$c'").mkString(", ")

  /** Shared CTE prefix: ev → bronze → silver, matching the Spark chain.
    * date_trunc('microseconds', ts) mirrors Spark's nanos→micros truncation;
    * epoch_us gives the same integer microseconds as unix_micros. */
  val baseCtes: String =
    s"""WITH ev AS (
       |  SELECT user_id AS trial_id, event_type AS channel,
       |         date_trunc('microseconds', ts) AS ts, event_id, value,
       |         CAST(round(value * 100.0) AS BIGINT) AS c,
       |         CAST(json_extract_string(props, '$$.k') AS INT) AS k
       |  FROM events
       |  WHERE event_type IN ($channelsIn) AND value IS NOT NULL
       |), bronze AS (
       |  SELECT trial_id, channel, ts, event_id, value, c, k,
       |         row_number() OVER (PARTITION BY trial_id, channel ORDER BY ts, event_id) - 1 AS sample_idx,
       |         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY trial_id)) / 1000000.0 AS time_sec
       |  FROM ev
       |), silver AS (
       |  SELECT trial_id, channel, sample_idx, time_sec, value, c, k, z FROM (
       |    SELECT *, $ZF AS z
       |    FROM (
       |      SELECT *, $MeanF AS mean_val, $StdF AS std_val
       |      FROM (
       |        SELECT *,
       |               CAST(sum(c) OVER w AS DOUBLE) AS s1c,
       |               CAST(sum(c * c) OVER w AS DOUBLE) AS s2c,
       |               CAST(count(*) OVER w AS DOUBLE) AS cnt_d
       |        FROM bronze
       |        WINDOW w AS (PARTITION BY trial_id, channel)
       |      )
       |    )
       |  ) WHERE abs(z) <= $ZOutlier
       |)""".stripMargin

  /** CTE extension: silver → epoch lag columns → single-pass feature agg. */
  val epochCtes: String =
    s"""$baseCtes, ep AS (
       |  SELECT trial_id, channel, sample_idx, value, c, z,
       |         CAST(floor(time_sec / $StepSec) AS BIGINT) AS epoch_id,
       |         -- CAST AS DOUBLE: BIGINT * decimal-literal is DECIMAL(26,1)
       |         -- in DuckDB (can stringify as 0E-x); Spark side is DOUBLE
       |         CAST(CAST(floor(time_sec / $StepSec) AS BIGINT) * $StepSec AS DOUBLE) AS win_start_sec,
       |         CAST(CAST(floor(time_sec / $StepSec) AS BIGINT) * $StepSec + $WinSec AS DOUBLE) AS win_end_sec
       |  FROM silver
       |), lag1 AS (
       |  SELECT *,
       |         CASE WHEN z >= 0 THEN 1 ELSE -1 END AS sign,
       |         lag(CASE WHEN z >= 0 THEN 1 ELSE -1 END) OVER w AS sign_prev,
       |         lag(c) OVER w AS c_prev
       |  FROM ep
       |  WINDOW w AS (PARTITION BY trial_id, channel, epoch_id ORDER BY sample_idx)
       |), lag2 AS (
       |  SELECT *,
       |         CASE WHEN sign_prev IS NOT NULL AND sign <> sign_prev THEN 1 ELSE 0 END AS is_change,
       |         CASE WHEN c_prev IS NULL THEN 0 ELSE c - c_prev END AS dc
       |  FROM lag1
       |), lag3 AS (
       |  SELECT *, lag(dc) OVER (PARTITION BY trial_id, channel, epoch_id ORDER BY sample_idx) AS dc_prev
       |  FROM lag2
       |), lag4 AS (
       |  SELECT *, CASE WHEN dc_prev IS NULL THEN 0 ELSE dc - dc_prev END AS d2c FROM lag3
       |), efeat_raw AS (
       |  SELECT trial_id, channel, epoch_id, win_start_sec, win_end_sec,
       |         count(*) AS n,
       |         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
       |         CAST(count(*) AS DOUBLE) AS cnt_d,
       |         CAST(sum(c) AS DOUBLE) AS s1c,
       |         CAST(sum(c * c) AS DOUBLE) AS s2c,
       |         sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS s3d,
       |         sum(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)) AS s4d,
       |         max(value) - min(value) AS p2p,
       |         CAST(sum(is_change) AS BIGINT) AS zcr_count,
       |         CAST(sum(dc) AS DOUBLE) AS sd1,
       |         CAST(sum(dc * dc) AS DOUBLE) AS sd2,
       |         CAST(sum(d2c) AS DOUBLE) AS sdd1,
       |         CAST(sum(d2c * d2c) AS DOUBLE) AS sdd2
       |  FROM lag4
       |  GROUP BY 1, 2, 3, 4, 5
       |), efeat1 AS (
       |  SELECT *,
       |         $MeanF AS mean,
       |         $StdF AS std,
       |         $RmsF AS rms,
       |         $M1F AS m1,
       |         $M2cF AS m2c,
       |         CAST(n_nan AS DOUBLE) / n AS nan_ratio,
       |         CAST(zcr_count AS DOUBLE) / $WinSec AS zcr,
       |         ${varF("s1c", "s2c")} AS var_x,
       |         ${varF("sd1", "sd2")} AS var_dx,
       |         ${varF("sdd1", "sdd2")} AS var_d2x
       |  FROM efeat_raw
       |), efeat2 AS (
       |  SELECT *,
       |         $SkewF AS skew,
       |         $KurtF AS kurtosis,
       |         var_x AS hj_activity,
       |         $MobilityF AS hj_mobility,
       |         $FlatlineF AS flatline_flag,
       |         $HighvarF AS highvar_flag
       |  FROM efeat1
       |), efeat AS (
       |  SELECT *, $ComplexityF AS hj_complexity
       |  FROM efeat2
       |)""".stripMargin

  val bronzeIngestSql: String =
    s"""$baseCtes
       |SELECT trial_id, channel, sample_idx, ${rsql("time_sec", 6, "time_sec")}, value, k
       |FROM bronze
       |ORDER BY trial_id, channel, sample_idx""".stripMargin

  val silverZscoreSql: String =
    s"""$baseCtes
       |SELECT trial_id, channel, sample_idx, ${rsql("time_sec", 6, "time_sec")}, value,
       |       ${rsql("z", 4, "z")}
       |FROM silver
       |ORDER BY trial_id, channel, sample_idx""".stripMargin

  val goldTrialStatsSql: String =
    s"""$baseCtes, gold_raw AS (
       |  SELECT trial_id, channel,
       |         count(*) AS n_samples,
       |         min(time_sec) AS t_start_sec,
       |         max(time_sec) AS t_end_sec,
       |         max(time_sec) - min(time_sec) AS duration_sec,
       |         count(*) / $FS AS duration_from_count_sec,
       |         CAST(sum(c) AS DOUBLE) AS s1c,
       |         CAST(sum(c * c) AS DOUBLE) AS s2c,
       |         CAST(count(*) AS DOUBLE) AS cnt_d,
       |         min(value) AS min_value,
       |         max(value) AS max_value,
       |         quantile_cont(value, 0.5) AS median_value,
       |         quantile_cont(value, 0.95) AS p95_value,
       |         sum(z) AS sz1,
       |         sum(z * z) AS sz2,
       |         min(z) AS min_z,
       |         max(z) AS max_z
       |  FROM silver
       |  GROUP BY trial_id, channel
       |)
       |SELECT trial_id, channel, n_samples,
       |       ${rsql("t_start_sec", 6, "t_start_sec")},
       |       ${rsql("t_end_sec", 6, "t_end_sec")},
       |       ${rsql("duration_sec", 6, "duration_sec")},
       |       ${rsql("duration_from_count_sec", 6, "duration_from_count_sec")},
       |       ${rsql(s"($MeanF)", 4, "mean_value")},
       |       ${rsql(s"($StdF)", 4, "std_value")},
       |       ${rsql(s"($MeanF)", 4, "mean_abs_value")},
       |       min_value, max_value,
       |       ${rsql("median_value", 4, "median_value")},
       |       ${rsql("p95_value", 4, "p95_value")},
       |       ${rsql(s"($MeanZF)", 4, "mean_z")},
       |       ${rsql(s"($StdZF)", 4, "std_z")},
       |       ${rsql("min_z", 4, "min_z")},
       |       ${rsql("max_z", 4, "max_z")},
       |       ${rsql("(CASE WHEN duration_sec > 0 THEN n_samples / duration_sec END)", 10, "samples_per_sec")}
       |FROM gold_raw
       |ORDER BY trial_id, channel""".stripMargin

  val goldEpochFeaturesSql: String =
    s"""$epochCtes
       |SELECT trial_id, channel, epoch_id, win_start_sec, win_end_sec, n, n_nan,
       |       ${rsql("mean", 4, "mean")}, ${rsql("std", 4, "std")},
       |       ${rsql("rms", 4, "rms")}, ${rsql("p2p", 4, "p2p")},
       |       ${rsql("skew", 4, "skew")}, ${rsql("kurtosis", 4, "kurtosis")},
       |       zcr_count, ${rsql("zcr", 10, "zcr")}, ${rsql("nan_ratio", 4, "nan_ratio")},
       |       flatline_flag, highvar_flag
       |FROM efeat
       |ORDER BY trial_id, channel, epoch_id""".stripMargin

  val hjorthFeaturesSql: String =
    s"""$epochCtes
       |SELECT trial_id, channel, epoch_id,
       |       ${rsql("hj_activity", 4, "hj_activity")},
       |       ${rsql("hj_mobility", 4, "hj_mobility")},
       |       ${rsql("hj_complexity", 4, "hj_complexity")}
       |FROM efeat
       |ORDER BY trial_id, channel, epoch_id""".stripMargin

  val qcReportSql: String =
    s"""$epochCtes
       |SELECT trial_id, channel, count(*) AS n_epochs,
       |       CAST(sum(CASE WHEN flatline_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
       |       CAST(sum(CASE WHEN highvar_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_highvar
       |FROM efeat
       |GROUP BY trial_id, channel
       |ORDER BY trial_id, channel""".stripMargin

  val featureWideSql: String = {
    val fis = FeatureCols
      .map(f => s"CAST(round($f * 1000000.0) AS BIGINT) AS fi_$f").mkString(",\n         ")
    val pivots = (for (ch <- Channels; f <- FeatureCols) yield rsql(
      s"(CAST(sum(CASE WHEN channel = '$ch' THEN fi_$f END) AS DOUBLE) / (CAST(count(CASE WHEN channel = '$ch' THEN fi_$f END) AS DOUBLE) * 1000000.0))",
      4, s"${ch}_${f}_avg"))
      .mkString(",\n       ")
    s"""$epochCtes, wide_src AS (
       |  SELECT trial_id, channel,
       |         $fis
       |  FROM efeat
       |  WHERE NOT flatline_flag AND NOT highvar_flag AND nan_ratio <= 0.05
       |)
       |SELECT trial_id,
       |       $pivots
       |FROM wide_src
       |GROUP BY trial_id
       |ORDER BY trial_id""".stripMargin
  }

  val featureUnpivotSql: String = {
    val cols = (for (ch <- Channels; f <- FeatureCols)
      yield s"${ch}_${f}_avg").mkString(", ")
    s"""WITH wide AS (
       |$featureWideSql
       |), u AS (
       |  UNPIVOT wide ON $cols INTO NAME name VALUE avg_value
       |)
       |SELECT trial_id,
       |       regexp_extract(name, '^([^_]+)_', 1) AS channel,
       |       regexp_replace(regexp_replace(name, '^[^_]+_', ''), '_avg$$', '') AS feature,
       |       avg_value
       |FROM u
       |ORDER BY trial_id, channel, feature""".stripMargin
  }

  val firBandpassSql: String = {
    val terms = FirCoeffs.zipWithIndex.map { case (h, k) =>
      if (k == 0) s"$h * value" else s"$h * lag(value, $k) OVER w"
    }.mkString(" + ")
    s"""$baseCtes
       |SELECT trial_id, channel, sample_idx, value, ${rsql("y_bp", 4, "y_bp")} FROM (
       |  SELECT trial_id, channel, sample_idx, value,
       |         $terms AS y_bp
       |  FROM bronze
       |  WINDOW w AS (PARTITION BY trial_id, channel ORDER BY sample_idx)
       |)
       |ORDER BY trial_id, channel, sample_idx""".stripMargin
  }
}
