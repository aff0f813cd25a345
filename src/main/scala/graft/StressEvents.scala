package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement: the event-analytics family at 10× gate volume.
  * [[StressRelational]] covered the TPC-H classics and StressCuration
  * the corpus operators; the events table's window-heavy family
  * (sessionize, funnels, retention, as-of, concurrency) had only sf0.1
  * numbers — and per-user windows are exactly where a hidden
  * one-reducer or state blowup would hide. Replica r shifts user_id and
  * event_id by r·10⁶ (disjoint user universes — per-user series,
  * session shapes and funnel paths are preserved exactly; timestamps
  * unchanged, so global time axes like event_series/twap keep their
  * span while carrying 10× the rows). Registered queries verbatim. */
object StressEvents {

  private val Off = 1000000L
  private val Reps = 10

  val Queries: Seq[String] = Seq(
    "sessionize", "sessionize_native", "session_gap_sweep", "asof_join",
    "event_funnel", "funnel_latency", "event_retention",
    "rolling_active_users", "event_transitions", "twap", "interval_join",
    "session_concurrency", "growth_accounting", "event_dedup_report",
    "attribution_lasttouch", "attribution_positional", "rate_spike",
    "event_outlier_mad", "late_arrival_audit", "concentration_report",
    // round 13: the series-diagnostics additions — change-point family
    // (one shared daily agg each), ACF (7 leads on one exchange), and
    // the hourly coverage-gap audit
    "change_point", "change_point_2", "change_point_k",
    "acf_daily", "event_gaps", "event_burstiness", "transition_stationary",
    // round 14: the truncated-kernel EWMA (16 lags on one exchange) and
    // the CUSUM drift alarm (reflection identity — 3 windows, one exchange)
    "ewma_daily", "cusum_alarm", "seasonal_decompose", "xcorr_daily",
    // round 15: the residual MAD gate — data volume identical to
    // seasonal_decompose (shares its one daily agg); the two chained
    // percentile windows ride the calendar-bounded dense frame
    "seasonal_anomaly",
    // round 16: the rolling-origin backtest + its planned consumer —
    // one daily agg each; the cutoff×prefix frame is calendar², so 10×
    // VOLUME (same span) must read near-flat
    "forecast_backtest", "forecast_planned")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_events10x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"$workDir/events.parquet"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      Tables.events(spark, baseDir)
        .withColumn("r", explode(expr(s"sequence(0, ${Reps - 1})")))
        .select(
          (col("event_id") + col("r") * Off).as("event_id"),
          col("ts"),
          (col("user_id") + col("r") * Off).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }

    def time(name: String, dir: String): Double = {
      val passes = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      passes.min
    }

    // optional extra args = query subset (focused re-measurement)
    val qs = if (args.length > 2) args.drop(2).toSeq else Queries
    qs.foreach(time(_, baseDir)) // warmup
    qs.foreach { q =>
      val t1 = time(q, baseDir)
      val t10 = time(q, workDir)
      println(f"TIME query=$q sf01=$t1%.2f x10=$t10%.2f factor=${t10 / math.max(t1, 0.01)}%.1f")
    }
    spark.stop()
  }
}
