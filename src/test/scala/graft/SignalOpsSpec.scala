package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SignalOps

class SignalOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)
  private lazy val bronze = SignalOps.bronzeIngest(events)
  private lazy val silver = SignalOps.silver(events)

  test("bronze_ingest whitelists channels, drops nulls, indexes samples") {
    val chans = bronze.select("channel").distinct().collect().map(_.getString(0)).toSet
    assert(chans.subsetOf(SignalOps.Channels.toSet))
    assert(bronze.filter(col("value").isNull).count() == 0)
    // sample_idx is a dense 0..n-1 sequence per (trial, channel)
    val bad = bronze.groupBy("trial_id", "channel")
      .agg(count(lit(1)).as("n"), max("sample_idx").as("mx"), min("sample_idx").as("mn"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0)
    assert(bad.count() == 0)
    // time_sec starts at 0 within each trial
    val minT = bronze.groupBy("trial_id").agg(min("time_sec").as("t0"))
      .filter(col("t0") =!= 0.0)
    assert(minT.count() == 0)
  }

  test("silver z-scores are standardized and outlier-free") {
    val stats = silver.groupBy("trial_id", "channel")
      .agg(avg("z").as("mz"), max(abs(col("z"))).as("maxabs"))
      .collect()
    assert(stats.forall(_.getAs[Double]("maxabs") <= SignalOps.ZOutlier))
    // z means stay near 0 (they are exactly 0 pre-filter; the |z|>6 cut can
    // shift them slightly)
    assert(stats.forall(r => math.abs(r.getAs[Double]("mz")) < 1.0))
  }

  test("gold trial stats are internally consistent") {
    val rows = SignalOps.goldTrialStats(silver).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_value") <= r.getAs[Double]("median_value"))
      assert(r.getAs[Double]("median_value") <= r.getAs[Double]("p95_value"))
      assert(r.getAs[Double]("p95_value") <= r.getAs[Double]("max_value"))
      assert(r.getAs[Double]("duration_sec") >= 0.0)
    }
  }

  test("epoch features: rms >= |mean|, p2p >= 0, hjorth non-negative") {
    val rows = SignalOps.epochFeatures(silver).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rms") >= math.abs(r.getAs[Double]("mean")) - 1e-9)
      assert(r.getAs[Double]("p2p") >= 0.0)
      Option(r.getAs[java.lang.Double]("var_x")).foreach(v => assert(v >= 0.0))
      assert(r.getAs[Double]("hj_mobility") >= 0.0)
      assert(r.getAs[Double]("hj_complexity") >= 0.0)
    }
  }

  test("FIR band-pass attenuates DC and passes in-band tones") {
    import spark.implicits._
    // synthetic uniform signal at FS=128: DC + 20 Hz in-band tone
    val fs = SignalOps.FS
    val n = 512
    val rows = (0 until n).map { i =>
      val t = i / fs
      (1L, "synth", i.toLong, 10.0 + math.sin(2 * math.Pi * 20.0 * t))
    }
    val df = rows.toDF("trial_id", "channel", "sample_idx", "value")
    val out = SignalOps.firBandpass(df)
      .filter(col("sample_idx") >= 2 * (SignalOps.FirTaps - 1)) // past transient
      .agg(avg("y_bp").as("dc_out"), stddev_samp("y_bp").as("ac_out"))
      .collect().head
    val dcOut = out.getAs[Double]("dc_out")
    val acOut = out.getAs[Double]("ac_out")
    // DC is outside the 4-40 Hz band (gain ~0.02): mean output << DC 10.0
    assert(math.abs(dcOut) < 0.5, s"DC leak: $dcOut")
    // the 20 Hz tone is in-band (gain ~1.0): its RMS ~0.707 survives
    assert(acOut > 0.5, s"in-band tone over-attenuated: $acOut")
  }

  test("feature_wide has one row per QC-passing trial and pivoted columns") {
    val wide = SignalOps.featureWide(SignalOps.epochFeatures(silver))
    val cols = wide.columns.toSet
    for (ch <- SignalOps.Channels; f <- SignalOps.FeatureCols)
      assert(cols.contains(s"${ch}_${f}_avg"))
    assert(wide.select("trial_id").distinct().count() == wide.count())
  }
}
