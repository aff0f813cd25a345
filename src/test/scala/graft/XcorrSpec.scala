package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Xcorr

/** Cross-correlation semantics on planted pairs of daily series: a
  * shifted copy peaks at EXACTLY its shift lag with r = 1, values match
  * an in-test Pearson reference at the emitted rounding, zero-variance
  * sides are NULL by the integer guard, and the global-axis alignment
  * contract (late-starting type reads real 0s) is pinned. */
class XcorrSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val UsPerDay = 86400000000L

  private def eventsFor(series: Map[String, Seq[Long]]) = {
    val rows = series.toSeq.flatMap { case (tpe, xs) =>
      xs.zipWithIndex.flatMap { case (c, d) =>
        (0L until c).map(i =>
          (d.toLong * 100000 + i, 1L, d.toLong * UsPerDay + i * 1000L, tpe))
      }
    }
    rows.toDF("event_id", "user_id", "t_us", "event_type")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
  }

  private def got(series: Map[String, Seq[Long]]): Map[(String, String, Long), (Long, Option[Double])] =
    Xcorr.xcorrDailyQ(eventsFor(series)).collect().map { r =>
      (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.toMap

  /** Pearson over the aligned global-axis pairs, the operator's own
    * overlap convention (b shifted by lag against a). */
  private def reference(a: Seq[Long], b: Seq[Long], lag: Int): Option[Double] = {
    val n = a.length
    val pairs = (0 until n).flatMap { d =>
      val d2 = d + lag
      if (d2 >= 0 && d2 < n) Some((a(d).toDouble, b(d2).toDouble)) else None
    }
    val m = pairs.length
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val vx = m * sxx - sx * sx
    val vy = m * syy - sy * sy
    if (vx == 0 || vy == 0) None
    else Some(math.rint((m * sxy - sx * sy) / math.sqrt(vx * vy) * 1e4) / 1e4)
  }

  test("a 2-day-shifted copy peaks at lag +2 with r exactly 1; all lags match the reference") {
    // b(d) = a(d - 2): b FOLLOWS a, so x_b(d + 2) = x_a(d) ⇒ peak at +2
    val p = (0 until 18).map(d => ((d * 7 + 3) % 11).toLong + 1)
    val a = p ++ Seq(1L, 1L)
    val b = Seq(1L, 1L) ++ p
    val out = got(Map("a" -> a, "b" -> b))
    assert(out(("a", "b", 2L))._2.contains(1.0),
      s"shifted copy must read r=1 at its shift: ${out(("a", "b", 2L))}")
    (-7L to 7L).foreach { k =>
      val exp = reference(a, b, k.toInt)
      assert(out(("a", "b", k))._2 == exp,
        s"lag $k diverges: got ${out(("a", "b", k))._2}, want $exp")
    }
    val peak = (-7L to 7L).maxBy(k => out(("a", "b", k))._2.getOrElse(-2.0))
    assert(peak == 2L, s"argmax lag must be the planted shift: $peak")
  }

  test("zero-variance side is NULL by the integer guard; ordered pairs only") {
    val out = got(Map("a" -> Seq(3L, 1L, 4L, 1L, 5L), "b" -> Seq(2L, 2L, 2L, 2L, 2L)))
    assert(out.keys.forall { case (ta, tb, _) => ta == "a" && tb == "b" },
      "only ordered (ta < tb) pairs must emit")
    assert(out.values.forall(_._2.isEmpty),
      s"constant side must yield NULL r at every lag: $out")
  }

  test("global-axis alignment: a late-starting type reads real 0s before its first event") {
    // b's raw events start at day 3; on the global clock days 0..2 are
    // real zeros — lag 0 then correlates a's early days against ZEROS,
    // not against a truncated overlap
    val a = Seq(5L, 5L, 5L, 1L, 1L, 1L)
    val bRaw = Seq(0L, 0L, 0L, 4L, 4L, 4L)
    val out = got(Map("a" -> a, "b" -> bRaw))
    val exp = reference(a, bRaw, 0)
    assert(out(("a", "b", 0L))._2 == exp && exp.get < 0,
      s"anti-phase on the shared clock must be strongly negative: ${out(("a", "b", 0L))}")
    assert(out(("a", "b", 0L))._1 == 6L, "lag-0 overlap must be the full global span")
  }
}
