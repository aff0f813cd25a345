package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SessionGapSweep, Sessionize}

/** Session-gap sweep: planted gap arithmetic, the 360-min row
  * cross-derived against the SHIPPED sessionize (one gap rule), and
  * the one-pass plan shape.
  */
class SessionGapSweepSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: session counts per gap from known inter-arrival times") {
    import spark.implicits._
    // user 1: events at 0, +10min, +120min, +600min → gaps 10/110/480 min
    // user 2: single event
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00"), (2L, 1L, "2024-01-01 00:10:00"),
      (3L, 1L, "2024-01-01 02:00:00"), (4L, 1L, "2024-01-01 10:00:00"),
      (5L, 2L, "2024-01-01 00:00:00"))
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    val out = SessionGapSweep.sessionGapSweepQ(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // n_users = 2 first events; gaps exceeding g add sessions
    assert(out(5L) == ((2L, 5L, 5L)))    // all 3 gaps > 5min
    assert(out(15L) == ((2L, 4L, 5L)))   // 110, 480
    assert(out(60L) == ((2L, 4L, 5L)))   // 110, 480
    assert(out(360L) == ((2L, 3L, 5L)))  // 480 only
  }

  test("gate: the 360-min row equals the shipped sessionize's session count") {
    val ev = Tables.events(spark, sf)
    val sessions = Sessionize.sessionize(ev).count()
    val row360 = SessionGapSweep.sessionGapSweepQ(ev)
      .filter(col("gap_min") === (Sessionize.GapUs / 60000000L)).collect().head
    assert(row360.getLong(2) == sessions)
    assert(row360.getLong(3) == ev.count())
  }

  test("plan: one user exchange, no joins — the sweep is one pass") {
    val plan = SessionGapSweep.sessionGapSweepQ(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
    val ex = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(ex == 1, s"expected 1 user exchange, saw $ex\n" + plan.take(1000))
  }
}
