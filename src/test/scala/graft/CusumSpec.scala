package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cusum

/** CUSUM semantics on planted daily series, checked EXACTLY against a
  * transparent in-test reference running the textbook max(0, ·)
  * RECURSION — the operator ships the window-expressible reflection
  * identity, so agreement here proves the identity on real data (the
  * Ewma/MarkovStationary pattern). */
class CusumSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val UsPerDay = 86400000000L

  /** events: one row per (day, i) occurrence for a single type. */
  private def eventsFor(countsByDay: Seq[Long], tpe: String = "a") = {
    val rows = countsByDay.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => (d.toLong * 1000 + i, 1L, d.toLong * UsPerDay, tpe))
    }
    rows.toDF("event_id", "user_id", "t_us", "event_type")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
  }

  /** The textbook recursion in the operator's integer milli units:
    * S_d = max(0, S_{d-1} + (x_d·1000 − μ − μ/2)). */
  private def reference(xs: Seq[Long]): (Long, Seq[Long]) = {
    val mu = xs.sum * 1000L / xs.length
    var s = 0L
    (mu, xs.map { x =>
      s = math.max(0L, s + (x * 1000 - mu - mu / 2))
      s
    })
  }

  private def got(countsByDay: Seq[Long]): (Long, Seq[(Long, Long, Int)]) = {
    val rows = Cusum.cusumAlarm(eventsFor(countsByDay)).orderBy("day")
      .select("mu_milli", "n_events", "cusum_milli", "alarm")
      .collect()
    (rows.head.getLong(0),
      rows.map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq)
  }

  test("reflection identity equals the max(0,·) recursion exactly") {
    val xs = (0 until 40).map(d => ((d * 7 + 3) % 13).toLong)
    val (muRef, sRef) = reference(xs)
    val (mu, rows) = got(xs)
    assert(mu == muRef)
    assert(rows.map(_._2) == sRef,
      s"window form diverges from the recursion: ${rows.map(_._2)} vs $sRef")
  }

  test("sustained drift accumulates to an alarm; the pre-shift regime never alarms") {
    // 10/day for 20 days then 100/day for 10: μ = 40000 milli, slack
    // 20000 — pre-shift dev −50000 pins S at 0; post-shift dev +40000
    // accumulates 40000·k, crossing h = 5·40000 = 200000 at k = 6
    val xs = Seq.fill(20)(10L) ++ Seq.fill(10)(100L)
    val (mu, rows) = got(xs)
    assert(mu == 40000L)
    val (_, sRef) = reference(xs)
    assert(rows.map(_._2) == sRef)
    assert(rows.take(20).forall(_._3 == 0), "pre-shift days must not alarm")
    val alarmDays = rows.zipWithIndex.collect { case ((_, _, 1), d) => d }
    assert(alarmDays == Seq(25, 26, 27, 28, 29),
      s"alarm must fire once 40000·k > 200000 (k≥6): $alarmDays")
    assert(rows(25)._2 == 240000L && rows(29)._2 == 400000L)
  }

  test("constant series pins S at exactly 0; downward drift never alarms (one-sided)") {
    val (_, const) = got(Seq.fill(15)(7L))
    assert(const.forall { case (_, s, a) => s == 0L && a == 0 },
      s"constant ⇒ dev = −μ/2 < 0 every day ⇒ S ≡ 0: $const")
    // high-then-silent: the drop is DOWNWARD — S decays back to 0, no
    // alarm anywhere (run on negated deviations for the two-sided
    // question, per the contract). A nonzero last day closes the span:
    // the dense axis is min..max of OBSERVED days, so trailing silence
    // past the last event is unknowable (the acf/ewma convention)
    val xs = Seq.fill(10)(20L) ++ Seq.fill(9)(0L) ++ Seq(20L)
    val (mu, rows) = got(xs)
    val (_, sRef) = reference(xs)
    assert(rows.map(_._2) == sRef)
    assert(rows.forall(_._3 == 0), s"downward drift must not alarm: $rows")
    assert(mu == 11000L)
  }

  test("holes are real zeros: a silent day pushes the statistic DOWN, not skipped") {
    // days 0,1,2,4 have events; day 3 is absent from the raw stream —
    // densification must materialize it as x = 0
    val xs = Seq(5L, 5L, 5L, 0L, 5L)
    val (mu, rows) = got(xs)
    assert(rows.map(_._1) == xs, s"dense axis must carry the hole as 0: $rows")
    val (muRef, sRef) = reference(xs)
    assert(mu == muRef && rows.map(_._2) == sRef)
  }

  test("two types compute independent baselines on one frame") {
    val a = eventsFor(Seq.fill(10)(3L), "a")
    val b = eventsFor(Seq.fill(5)(9L) ++ Seq.fill(4)(0L) ++ Seq(9L), "b")
    val out = Cusum.cusumAlarm(a.unionByName(b))
      .select("event_type", "mu_milli").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("a" -> 3000L, "b" -> 5400L))
  }
}
