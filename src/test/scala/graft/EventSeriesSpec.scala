package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventSeries

/** Gap-filled activity series: planted gap rows and cents sums, a full
  * Scala recount on the gate events, and the inline-sequence plan shape.
  */
class EventSeriesSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  test("planted: silent days appear as zero rows, active days sum cents") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, 1.25),
      (2L, "2024-01-01 11:00:00", 1L, 2.00),  // day 19723, 2 events, 325 cents
      (3L, "2024-01-04 09:00:00", 1L, 0.50),  // day 19726 → gaps 19724/19725
      (4L, "2024-01-02 00:00:00", 2L, 3.00))  // single-day user
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = EventSeries.eventSeriesQ(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val d0 = 19723L // 2024-01-01
    assert(out((1L, d0)) == ((2L, 325L, true)))
    assert(out((1L, d0 + 1)) == ((0L, 0L, false)))
    assert(out((1L, d0 + 2)) == ((0L, 0L, false)))
    assert(out((1L, d0 + 3)) == ((1L, 50L, true)))
    assert(out((2L, d0 + 1)) == ((1L, 300L, true)))
    assert(out.size == 5)
  }

  test("gate events: series recomputes from a plain Scala fold") {
    val rows = events
      .select(col("user_id"), expr(s"unix_micros(ts) div ${EventSeries.UsPerDay}"),
        expr("CAST(round(value * 100.0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).flatMap { case (u, rs) =>
      val byDay = rs.groupBy(_._2)
      (rs.map(_._2).min to rs.map(_._2).max).map { d =>
        val evs = byDay.getOrElse(d, Array.empty[(Long, Long, Long)])
        (u, d) -> ((evs.length.toLong, evs.map(_._3).sum, evs.nonEmpty))
      }
    }
    val out = EventSeries.eventSeriesQ(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out == expected.toMap)
  }

  test("plan: day axis explodes the sequence expression inline") {
    val plan = EventSeries.eventSeries(events)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode(sequence("), plan.take(1200))
  }
}
