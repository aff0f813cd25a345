package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SeasonalDecompose

/** Classical-decomposition semantics on planted daily series, checked
  * EXACTLY against a transparent in-test integer reference, with the
  * reconstruction identity `x·1000 = trend + seas + resid` pinned on
  * every row (the truncations must cancel by construction). */
class SeasonalDecomposeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val UsPerDay = 86400000000L

  private def eventsFor(countsByDay: Seq[Long], tpe: String = "a") = {
    val rows = countsByDay.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => (d.toLong * 1000 + i, 1L, d.toLong * UsPerDay, tpe))
    }
    rows.toDF("event_id", "user_id", "t_us", "event_type")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
  }

  /** The operator's own integer arithmetic on a dense 0-based series
    * (fixture day == index, so dow == index % 7). */
  private def reference(xs: Seq[Long]): Seq[(Long, Long, Long)] = {
    val n = xs.length
    val trend = xs.indices.map { d =>
      val lo = math.max(0, d - 3); val hi = math.min(n - 1, d + 3)
      (lo to hi).map(xs).sum * 1000L / (hi - lo + 1)
    }
    val detr = xs.indices.map(d => xs(d) * 1000L - trend(d))
    val seas = (0 until 7).map { w =>
      val idx = xs.indices.filter(_ % 7 == w)
      if (idx.isEmpty) 0L
      else {
        val ds = idx.map(detr).sum
        if (ds < 0) -((-ds) / idx.length) else ds / idx.length
      }
    }
    xs.indices.map(d => (trend(d), seas(d % 7), detr(d) - seas(d % 7)))
  }

  private def got(countsByDay: Seq[Long]): Seq[(Long, Long, Long, Long)] =
    SeasonalDecompose.seasonalDecompose(eventsFor(countsByDay)).orderBy("day")
      .select("n_events", "trend_milli", "seas_milli", "resid_milli")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("matches the integer reference; reconstruction identity exact on every row") {
    val xs = (0 until 35).map(d => ((d * 11 + 5) % 17).toLong)
    val g = got(xs)
    val ref = reference(xs)
    assert(g.map(t => (t._2, t._3, t._4)) == ref,
      s"diverges from reference: $g vs $ref")
    g.foreach { case (x, tr, se, re) =>
      assert(x * 1000L == tr + se + re,
        s"reconstruction broken: $x*1000 != $tr + $se + $re")
    }
  }

  test("constant series decomposes to trend = level, seasonal = 0, residual = 0") {
    val g = got(Seq.fill(21)(6L))
    assert(g.forall { case (x, tr, se, re) =>
      x == 6L && tr == 6000L && se == 0L && re == 0L }, s"constant: $g")
  }

  test("linear ramp: interior trend IS the ramp (centered mean of linear is exact)") {
    // 1-based: a 0-count day 0 would never reach the raw stream and the
    // observed span would start at day 1 (the dense-axis convention)
    val xs = (1L to 21L).toSeq
    val g = got(xs)
    assert(g.map(t => (t._2, t._3, t._4)) == reference(xs))
    (3 until 18).foreach { d =>
      assert(g(d)._2 == xs(d) * 1000L,
        s"interior trend must equal the ramp at $d: ${g(d)}")
    }
  }

  test("planted weekly spike surfaces in the dow-0 seasonal, not the residual") {
    // level 50 with +70 every dow 0, four full weeks
    val xs = (0 until 28).map(d => if (d % 7 == 0) 120L else 50L)
    val g = got(xs)
    assert(g.map(t => (t._2, t._3, t._4)) == reference(xs))
    val seasByDow = g.zipWithIndex.map { case (t, d) => d % 7 -> t._3 }.toMap
    assert((1 to 6).forall(w => seasByDow(0) > seasByDow(w) + 50000),
      s"the weekly spike must load on the dow-0 seasonal: $seasByDow")
    // residuals carry only edge effects — far smaller than the spike
    assert(g.forall(_._4.abs < 35000L), s"residual must not absorb the spike: $g")
  }

  // ------------------------------------------ round 15: seasonal_anomaly

  test("calendar violation: the seasonal gate flags it, the raw-count MAD gate cannot") {
    // 8 weeks of a hard weekday/weekend profile (100 on dow 0-4, 10 on
    // dow 5-6), with ONE weekend day (day 40, dow 5) carrying
    // weekday-level traffic — its RAW value (100) is a perfectly
    // ordinary count, so a raw daily-count median/MAD gate is blind to
    // it by construction; its RESIDUAL is the violation
    val xs = (0 until 56).map { d =>
      if (d == 40) 100L else if (d % 7 >= 5) 10L else 100L
    }
    val flagged = graft.operators.SeasonalAnomaly
      .seasonalAnomaly(eventsFor(xs))
      .filter(col("is_anomaly")).select("day").collect()
      .map(_.getLong(0)).toSet
    assert(flagged.contains(40L), s"the violated weekend day must flag: $flagged")
    // anything else flagged must be either spillover inside the
    // violation's 7-day trend window or a SERIES-EDGE day (the decompose
    // averages partial windows at the edges to keep reconstruction
    // exact — its stated corner; edge residuals are real artifacts of
    // that choice and may clear the gate). Interior calendar-conforming
    // days must NOT flag.
    assert(flagged.forall(d => (d - 40L).abs <= 3L || d < 3L || d > 52L),
      s"an interior conforming day flagged: $flagged")
    // the raw-count gate (the RobustOutlier algebra on daily counts
    // directly): day 40's value is exactly the weekday median — d2 = 0,
    // structurally unflaggable
    val c2 = xs.map(_ * 2)
    val med2 = c2.sorted.apply(c2.length / 2) // 56 values, 40 of them 200
    assert(med2 == 200L && c2(40) == 200L,
      "fixture: the violated day's raw value must equal the raw median")
    // flat-residual guard: a constant series flags nothing
    val flat = graft.operators.SeasonalAnomaly
      .seasonalAnomaly(eventsFor((0 until 28).map(_ => 50L)))
      .filter(col("is_anomaly")).count()
    assert(flat == 0L)
  }

  test("seasonal_forecast: exact level+dow reproduction of the planted profile") {
    val xs = (0 until 56).map(d => if (d % 7 >= 5) 10L else 100L)
    val ref = reference(xs)
    val trendLast = ref.last._1
    val seasByDow = (0 until 7).map(w => w -> ref(w + 21)._2).toMap // interior week
    val got = graft.operators.SeasonalAnomaly.seasonalForecast(eventsFor(xs))
      .orderBy("day")
      .select("day", "horizon", "forecast_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
    assert(got.length == 7)
    got.foreach { case (day, h, f) =>
      assert(day == 55L + h)
      assert(f == trendLast + seasByDow((day % 7).toInt),
        s"day $day: $f != ${trendLast + seasByDow((day % 7).toInt)}")
    }
    // the forecast carries the weekly shape forward: predicted weekdays
    // far above predicted weekend days
    val byDow = got.map { case (day, _, f) => (day % 7, f) }.toMap
    assert((0L to 4L).forall(w => byDow(w) > byDow(5L) + 50000L))
    // short span: unseen dow classes forecast the bare level (seas = 0)
    val shortGot = graft.operators.SeasonalAnomaly
      .seasonalForecast(eventsFor(Seq(10L, 10L, 10L)))
      .select("horizon", "forecast_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(shortGot.size == 7)
    // days 0..2 observed (dow 0..2); horizons landing on dow 3..6 are
    // unseen -> level only (trend at day 2 = mean of the flat 10s)
    assert((1L to 4L).forall(h => shortGot(h) == 10000L), s"$shortGot")
  }

  test("seasonal_anomaly rides the decompose residual exactly (gate algebra spot check)") {
    val xs = (0 until 56).map { d =>
      if (d == 40) 100L else if (d % 7 >= 5) 10L else 100L
    }
    val rows = graft.operators.SeasonalAnomaly.seasonalAnomaly(eventsFor(xs))
      .orderBy("day")
      .select("day", "resid_milli", "med2", "mad4", "is_anomaly").collect()
    val resid = reference(xs).map(_._3)
    rows.foreach { r =>
      assert(r.getLong(1) == resid(r.getLong(0).toInt),
        s"residual drifted from the decompose reference at day ${r.getLong(0)}")
      val d2 = math.abs(2 * r.getLong(1) - r.getLong(2))
      assert(r.getBoolean(4) == (r.getLong(3) > 0 && 2 * d2 > 6 * r.getLong(3)))
    }
  }

  // ------------------------------------------ round 16: seasonal_strength

  /** The operator's own strength arithmetic off the decompose
    * reference: exact integer n²-variance stats, one double ratio,
    * shared round-4. */
  private def strengthRef(xs: Seq[Long]): (Option[Double], Option[Double]) = {
    val comps = reference(xs)
    val n = xs.length.toLong
    def varn(v: Seq[Long]): Long = {
      val s = v.sum; val s2 = v.map(x => x * x).sum
      n * s2 - s * s
    }
    val r = comps.map(_._3)
    val tr = xs.indices.map(d => xs(d) * 1000L - comps(d)._2)
    val sr = xs.indices.map(d => xs(d) * 1000L - comps(d)._1)
    def f(den: Long): Option[Double] =
      if (den > 0)
        Some(math.round(math.max(0.0,
          1.0 - varn(r).toDouble / den) * 10000.0) / 10000.0)
      else None
    (f(varn(tr)), f(varn(sr)))
  }

  private def strengthGot(xs: Seq[Long]): (Option[Double], Option[Double]) = {
    val r = graft.operators.SeasonalAnomaly.seasonalStrengthQ(eventsFor(xs))
      .head()
    def g(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
    (g(2), g(3))
  }

  test("seasonal_strength matches the integer-stat reference; classes separate") {
    // pseudorandom: exact agreement with the reference arithmetic
    val xs = (0 until 35).map(d => ((d * 11 + 5) % 17).toLong)
    val (gT, gS) = strengthGot(xs)
    val (rT, rS) = strengthRef(xs)
    assert((gT, gS) == (rT, rS), s"($gT,$gS) != ($rT,$rS)")
    // hard weekly profile: calendar-dominated — F_S high, well above F_T
    val prof = (0 until 42).map(d => if (d % 7 >= 5) 10L else 100L)
    val (pT, pS) = strengthGot(prof)
    assert((pT, pS) == strengthRef(prof))
    assert(pS.exists(_ > 0.95) && pS.get > pT.getOrElse(0.0) + 0.3,
      s"profile must read calendar-dominated: F_T=$pT F_S=$pS")
    // linear ramp: trend-dominated — F_T ≈ 1
    val ramp = (1L to 28L).toSeq
    val (mT, mS) = strengthGot(ramp)
    assert((mT, mS) == strengthRef(ramp))
    assert(mT.exists(_ > 0.95), s"ramp must read trend-dominated: F_T=$mT F_S=$mS")
    // constant: zero variance everywhere — no structure to attribute
    assert(strengthGot(Seq.fill(21)(6L)) == ((None, None)))
  }
}
