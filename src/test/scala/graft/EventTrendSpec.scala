package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventSeries, EventTrend}

/** Trailing trend: planted frame sums over a gappy series, a Scala
  * recount on the gate events, and the shared user exchange.
  */
class EventTrendSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  test("planted: range frame counts silent days, WoW delta at the head") {
    import spark.implicits._
    // user 1: events day 0 (2x), day 8 (1x) → series days 0..8
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.00),
      (2L, "2024-01-01 11:00:00", 1L, 2.00),
      (3L, "2024-01-09 09:00:00", 1L, 4.00))
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val d0 = 19723L
    val out = EventTrend.eventTrendQ(df).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))).toMap
    assert(out(d0) == ((2L, 300L, 2L, false)))
    assert(out(d0 + 6) == ((2L, 300L, 2L, false)))  // day 0 still in frame
    assert(out(d0 + 7) == ((0L, 0L, -2L, true)))    // frame now empty; lag(7)=day0
    assert(out(d0 + 8) == ((1L, 400L, -1L, false))) // new event; lag(7)=day1's 2
  }

  test("gate events: trend recomputes from a plain Scala fold") {
    val series = EventSeries.eventSeriesQ(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = series.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val byDay = rs.map(r => r._2 -> ((r._3, r._4))).toMap
      val days = rs.map(_._2).sorted
      val trail = days.map { d =>
        val win = (d - 6 to d).flatMap(byDay.get)
        d -> ((win.map(_._1).sum, win.map(_._2).sum))
      }.toMap
      days.zipWithIndex.map { case (d, i) =>
        val lag7 = if (i >= 7) trail(days(i - 7))._1 else 0L
        (u, d) -> ((trail(d)._1, trail(d)._2, trail(d)._1 - lag7,
          trail(d)._1 == 0L))
      }
    }.toMap
    val out = EventTrend.eventTrendQ(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(out == expected)
  }

  test("plan: trend windows add no data-scaled exchange beyond the series'") {
    val plan = EventTrend.eventTrend(EventSeries.eventSeries(events))
      .queryExecution.executedPlan.toString
    val userEx = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(_.startsWith("Exchange hashpartitioning(user_id"))
    // series: daily agg + axis agg exchanges; trend windows reuse the
    // join's user_id co-partitioning — no third user exchange family
    assert(userEx <= 3, s"unexpected extra user exchanges ($userEx):\n$plan")
  }
}
