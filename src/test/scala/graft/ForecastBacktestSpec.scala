package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ForecastBacktest

/** Rolling-origin backtest semantics checked EXACTLY against a
  * transparent in-test integer reference (the SeasonalDecomposeSpec
  * convention): per cutoff the model re-fits on the prefix only — the
  * no-leak contract — and the report's MAE/naive/skill integers must
  * reproduce the reference's arithmetic bit-for-bit. */
class ForecastBacktestSpec extends AnyFunSuite {
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

  /** The operator's own integer arithmetic, per horizon:
    * (n_cutoffs, mae_milli, naive_mae_milli, skill_ppm). */
  private def reference(xs: Seq[Long])
      : Map[Long, (Long, Long, Long, Option[Long])] = {
    val n = xs.length
    val acc = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    (ForecastBacktest.MinTrain until n - 1).foreach { b =>
      val trend = (0 to b).map { d =>
        val lo = math.max(0, d - 3); val hi = math.min(b, d + 3)
        (lo to hi).map(xs).sum * 1000L / (hi - lo + 1)
      }
      val detr = (0 to b).map(d => xs(d) * 1000L - trend(d))
      val seas = (0 until 7).map { w =>
        val idx = (0 to b).filter(_ % 7 == w)
        val ds = idx.map(detr).sum
        if (ds < 0) -((-ds) / idx.length) else ds / idx.length
      }
      val level = trend(b)
      (1 to ForecastBacktest.Horizon).foreach { h =>
        val d = b + h
        if (d < n) {
          val fc = level + seas(d % 7)
          val err = math.abs(fc - xs(d) * 1000L)
          val nerr = math.abs(level - xs(d) * 1000L)
          val (c, se, sn) = acc.getOrElse(h.toLong, (0L, 0L, 0L))
          acc(h.toLong) = (c + 1, se + err, sn + nerr)
        }
      }
    }
    acc.toMap.map { case (h, (c, se, sn)) =>
      h -> (c, se / c, sn / c, if (sn == 0) None else Some(se * 1000000L / sn))
    }
  }

  private def got(countsByDay: Seq[Long])
      : Map[Long, (Long, Long, Long, Option[Long])] =
    ForecastBacktest.forecastBacktest(eventsFor(countsByDay))
      .collect().map { r =>
        r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))
      }.toMap

  test("matches the integer reference on a pseudorandom 35-day series") {
    val xs = (0 until 35).map(d => ((d * 11 + 5) % 17).toLong)
    assert(got(xs) == reference(xs))
  }

  test("planted weekly profile: the seasonal model beats the level-only naive at every horizon") {
    // strong calendar structure on a flat level — exactly what the
    // seasonal component exists to capture; skill < 1e6 ppm everywhere
    val profile = Seq(20L, 22L, 21L, 20L, 23L, 3L, 2L)
    val xs = (0 until 42).map(d => profile(d % 7))
    val g = got(xs)
    assert(g == reference(xs))
    assert(g.keySet == (1L to 7L).toSet)
    g.foreach { case (h, (_, mae, naive, skill)) =>
      assert(mae < naive, s"h=$h: seasonal $mae !< naive $naive")
      assert(skill.exists(_ < 1000000L), s"h=$h skill=$skill")
    }
  }

  test("constant series: both models exact, skill NULL (naive error zero)") {
    val xs = Seq.fill(20)(7L)
    val g = got(xs)
    g.foreach { case (h, (_, mae, naive, skill)) =>
      assert(mae == 0L && naive == 0L && skill.isEmpty, s"h=$h: $mae $naive $skill")
    }
  }

  test("a span shorter than MinTrain+2 days has no evaluable cutoff: absent from the report") {
    assert(got(Seq.fill(8)(5L)).isEmpty) // cutoff needs b>=7 AND b<bmax=7
    assert(got(Seq.fill(9)(5L)).nonEmpty)
  }

  test("forecast_planned: evidence picks seasonal on the profile; ties and no-evidence run naive") {
    // strong weekly structure: the backtest certifies the seasonal model,
    // and the planned rows ARE the seasonal forecast's
    val profile = Seq(20L, 22L, 21L, 20L, 23L, 3L, 2L)
    val xs = (0 until 42).map(d => profile(d % 7))
    val planned = ForecastBacktest.forecastPlanned(eventsFor(xs))
      .orderBy("day").collect()
    assert(planned.forall(_.getString(3) == "seasonal"))
    val seasonal = graft.operators.SeasonalAnomaly.seasonalForecast(eventsFor(xs))
      .orderBy("day").collect()
    assert(planned.map(r => (r.getLong(1), r.getLong(4))).toSeq ==
      seasonal.map(r => (r.getLong(1), r.getLong(3))).toSeq)
    // constant series: Σerr == Σnerr == 0 — the tie runs the SIMPLER model
    val const = ForecastBacktest.forecastPlanned(eventsFor(Seq.fill(20)(7L)))
      .collect()
    assert(const.forall(_.getString(3) == "naive"))
    assert(const.forall(r => r.getLong(4) == 7000L),
      "naive forecast = level only")
    // short span (no evaluable cutoff): no evidence — naive, level-only
    val short = ForecastBacktest.forecastPlanned(eventsFor(Seq.fill(5)(3L)))
      .collect()
    assert(short.nonEmpty && short.forall(_.getString(3) == "naive"))
  }

  /** The interval reference: per horizon the SIGNED residuals
    * `x(d)·1000 − fc` across cutoffs, sorted, rank-selected at
    * ((n−1)·p) div 100 — the operator's own arithmetic in plain Scala. */
  private def referenceResiduals(xs: Seq[Long]): Map[Long, Vector[Long]] = {
    val n = xs.length
    val acc = scala.collection.mutable.Map.empty[Long, Vector[Long]]
      .withDefaultValue(Vector.empty)
    (ForecastBacktest.MinTrain until n - 1).foreach { b =>
      val trend = (0 to b).map { d =>
        val lo = math.max(0, d - 3); val hi = math.min(b, d + 3)
        (lo to hi).map(xs).sum * 1000L / (hi - lo + 1)
      }
      val detr = (0 to b).map(d => xs(d) * 1000L - trend(d))
      val seas = (0 until 7).map { w =>
        val idx = (0 to b).filter(_ % 7 == w)
        val ds = idx.map(detr).sum
        if (ds < 0) -((-ds) / idx.length) else ds / idx.length
      }
      val level = trend(b)
      (1 to ForecastBacktest.Horizon).foreach { h =>
        val d = b + h
        if (d < n) {
          val fc = level + seas(d % 7)
          acc(h.toLong) = acc(h.toLong) :+ (xs(d) * 1000L - fc)
        }
      }
    }
    acc.toMap
  }

  test("forecast_interval: bounds match the sorted-residual rank select on a pseudorandom series") {
    val xs = (0 until 35).map(d => ((d * 11 + 5) % 17).toLong)
    val res = referenceResiduals(xs)
    val out = ForecastBacktest.forecastInterval(eventsFor(xs))
      .orderBy("day").collect()
    assert(out.length == ForecastBacktest.Horizon)
    out.foreach { r =>
      val h = r.getLong(2); val fc = r.getLong(3)
      val sorted = res(h).sorted
      val n = sorted.length
      val kLo = ((n - 1).toLong * ForecastBacktest.LoPct) / 100
      val kHi = ((n - 1).toLong * ForecastBacktest.HiPct) / 100
      assert(r.getLong(4) == fc + sorted(kLo.toInt), s"h=$h lo")
      assert(r.getLong(5) == fc + sorted(kHi.toInt), s"h=$h hi")
      assert(r.getLong(6) == n.toLong, s"h=$h n_resid")
      assert(r.getLong(4) <= r.getLong(5), s"h=$h bracket")
    }
  }

  test("forecast_interval: constant series collapses to a point interval; short span carries NULL bounds") {
    val const = ForecastBacktest.forecastInterval(eventsFor(Seq.fill(20)(7L)))
      .collect()
    assert(const.nonEmpty)
    const.foreach { r =>
      assert(r.getLong(3) == 7000L)
      assert(r.getLong(4) == 7000L && r.getLong(5) == 7000L,
        "zero residuals => lo = hi = forecast")
      assert(r.getLong(6) > 0L)
    }
    // span 8: forecastable (decompose exists) but zero evaluable cutoffs
    val short = ForecastBacktest.forecastInterval(eventsFor(Seq.fill(8)(5L)))
      .collect()
    assert(short.nonEmpty, "forecast still ships without evidence")
    short.foreach { r =>
      assert(r.isNullAt(4) && r.isNullAt(5), "no evidence => no interval")
      assert(r.getLong(6) == 0L)
    }
  }

  test("two types evaluate independently") {
    // +1 keeps the span's END days observed (a zero count on the last
    // day would shrink the operator's dense axis — the span is defined
    // by OBSERVED days; interior zeros densify, endpoints anchor)
    val xsA = (0 until 21).map(d => ((d * 7 + 3) % 11).toLong + 1)
    val xsB = (0 until 28).map(d => ((d * 5 + 1) % 13).toLong + 1)
    val ev = eventsFor(xsA, "a").unionByName(eventsFor(xsB, "b"))
    val out = ForecastBacktest.forecastBacktest(ev)
      .collect().map { r =>
        (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5))))
      }.toMap
    val refA = reference(xsA); val refB = reference(xsB)
    assert(out == (refA.map { case (h, v) => ("a", h) -> v } ++
      refB.map { case (h, v) => ("b", h) -> v }))
  }
}
