package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Acf, EventGaps}

/** Series-memory and coverage-gap semantics on planted streams, all
  * hand-computed: a linear ramp autocorrelates to exactly 1.0 at every
  * lag, an alternating series flips sign with lag parity, a constant
  * series has no defined ACF (NULL by the integer variance guard), and
  * densification treats a missing day as a real zero. Gap runs merge
  * missing hours into maximal outages with exact accounting. */
class AcfGapsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def dayEvents(counts: Seq[(Long, Int)]) = // (day, n) sparse
    counts.flatMap { case (d, c) => Seq.fill(c)(("a", d * 86400000000L + 1L)) }
      .toDF("event_type", "t_us")
      .withColumn("ts", expr("timestamp_micros(t_us)"))

  private def acf(df: org.apache.spark.sql.DataFrame) =
    Acf.acfDailyQ(df).collect()
      .map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq

  test("linear ramp: ACF exactly 1.0 at every lag") {
    // counts 1,2,3,4,5,6,7,8,9 over 9 dense days: every lag-k pair set
    // is a perfect linear map, so r = 1.0 exactly (e.g. lag 1: n=8,
    // sx=36, sy=44, num = 8·240 − 36·44 = 336, both vars 336 → 1.0)
    val got = acf(dayEvents((0L to 8L).map(d => d -> (d.toInt + 1))))
    assert(got.map(_._1) == (1L to 7L) &&
      got.forall(r => r._3.contains(1.0)), s"ramp acf: $got")
    assert(got.map(_._2) == Seq(8L, 7L, 6L, 5L, 4L, 3L, 2L), "pair counts")
  }

  test("alternating series: sign flips with lag parity") {
    // counts 1,3,1,3,1,3 (6 days): odd lags pair lows with highs
    // (r = −1), even lags pair like with like (r = +1)
    val got = acf(dayEvents(Seq(0L -> 1, 1L -> 3, 2L -> 1, 3L -> 3, 4L -> 1, 5L -> 3)))
      .filter(_._1 <= 4L)
    assert(got.map(r => r._1 -> r._3) ==
      Seq(1L -> Some(-1.0), 2L -> Some(1.0), 3L -> Some(-1.0), 4L -> Some(1.0)),
      s"alternating acf: $got")
  }

  test("constant series: NULL by the zero-variance integer guard") {
    val got = acf(dayEvents((0L to 5L).map(_ -> 2)))
    assert(got.nonEmpty && got.forall(_._3.isEmpty), s"constant acf: $got")
  }

  test("densification: a missing day is a ZERO, hand-computed") {
    // observed days 0,1,3 at count 2 → dense series 2,2,0,2. Lag 1
    // pairs: x=(2,2,0), y=(2,0,2): n=3, sx=sy=4, sxx=syy=8, sxy=4 →
    // num = 12 − 16 = −4, vars = 24 − 16 = 8 → r = −4/8 = −0.5
    val got = acf(dayEvents(Seq(0L -> 2, 1L -> 2, 3L -> 2)))
    assert(got.find(_._1 == 1L).flatMap(_._3).contains(-0.5), s"hole acf: $got")
  }

  private def hourEvents(rows: (String, Long)*) = // (type, hour)
    rows.map { case (t, h) => (t, h * 3600000000L + 1L) }
      .toDF("event_type", "t_us")
      .withColumn("ts", expr("timestamp_micros(t_us)"))

  test("gap runs: two planted 2-hour outages, exact accounting; dense stream reports zeros") {
    // type a: hours 0,1,2,5,6,9 → missing 3,4 and 7,8 (two maximal runs
    // of 2); type b: hours 0..3 dense → the hashable all-clear row
    val df = hourEvents(
      (Seq(0L, 1L, 2L, 5L, 6L, 9L).map("a" -> _) ++
        (0L to 3L).map("b" -> _)): _*)
    val got = EventGaps.eventGapsQ(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == Seq(
      ("a", 0L, 9L, 10L, 6L, 4L, 2L, 2L),
      ("b", 0L, 3L, 4L, 4L, 0L, 0L, 0L)), s"gap report: $got")
  }
}
