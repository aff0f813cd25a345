package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventTransitions

/** Transition matrix: planted chains incl. the _start state and
  * equal-timestamp tie-break, a Scala recount on the gate events, and
  * the single data-scaled exchange.
  */
class EventTransitionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  test("planted: chains, _start entries, ppm row shares, ts tie by event_id") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:01", 1L, "view"),
      (2L, "2024-01-01 00:00:02", 1L, "click"),
      (3L, "2024-01-01 00:00:03", 1L, "view"),
      // user 2: two events at the SAME ts → order by event_id: view→click
      (10L, "2024-01-01 00:00:05", 2L, "view"),
      (11L, "2024-01-01 00:00:05", 2L, "click"))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = EventTransitions.eventTransitionsQ(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(("_start", "view")) == ((2L, 1000000L)))
    assert(out(("view", "click")) == ((2L, 1000000L)))
    assert(out(("click", "view")) == ((1L, 1000000L)))
    assert(out.size == 3)
  }

  test("gate events: matrix recomputes from a plain Scala fold") {
    val rows = events
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val ord = rs.sortBy(e => (e._3, e._2)).map(_._4)
      ("_start" +: ord.init.toSeq).zip(ord.toSeq)
    }
    val counts = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rowTot = counts.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val expected = counts.map { case ((p, c), n) =>
      (p, c) -> ((n, n * 1000000L / rowTot(p)))
    }
    val out = EventTransitions.eventTransitionsQ(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == expected)
  }

  test("plan: one user exchange scales with data; matrix stages are catalog-sized") {
    val plan = EventTransitions.eventTransitions(events)
      .queryExecution.executedPlan.toString
    val userEx = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(_.startsWith("Exchange hashpartitioning(user_id"))
    assert(userEx == 1, s"expected 1 user exchange, got $userEx:\n$plan")
  }
}
