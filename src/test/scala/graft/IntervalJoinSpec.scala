package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IntervalJoin, Sessionize}

/** Bucketed range join: planted bucket-boundary containment, the
  * every-event-exactly-once identity vs a naive Scala inequality join on
  * the gate events, and the no-nested-loop plan.
  */
class IntervalJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  test("planted: bucket-spanning session still captures all its events") {
    import spark.implicits._
    // user 1: events at 05:00 and 07:00 (gap 2h < 6h → ONE session) —
    // the interval [05:00, 07:00] crosses the 06:00 bucket boundary, so
    // the session registers in both buckets; each event matches once.
    // 10:00 event not in [05:00,07:00]: gap 3h → hmm, 07:00→10:00 = 3h
    // < 6h gap → same session actually. Use 20:00 (13h gap → new session).
    val df = Seq(
      (1L, "2024-01-01 05:00:00", 1L, 1.0),
      (2L, "2024-01-01 07:00:00", 1L, 1.0),
      (3L, "2024-01-01 20:00:00", 1L, 1.0))
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .withColumn("event_type", lit("view"))
    val out = IntervalJoin.intervalJoinQ(df).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out(1L) == out(2L), "same session across the bucket boundary")
    assert(out(3L) != out(1L), "13h gap starts a new session")
    assert(out.size == 3, "every event assigned exactly once")
  }

  test("gate events: bucketed join == naive inequality join, exactly once each") {
    val sess = Sessionize.sessionize(events)
      .select("user_id", "session_seq", "session_start_us", "session_end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bySess = sess.groupBy(_._1)
    val expected = ev.map { case (u, id, t) =>
      val hits = bySess(u).filter(s => t >= s._3 && t <= s._4)
      assert(hits.length == 1, s"event $id in ${hits.length} sessions")
      id -> hits.head._2
    }.toMap
    val out = IntervalJoin.intervalJoinQ(events).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == expected)
  }

  test("plan: equi hash join on (user, bucket) — no nested loop, no cartesian") {
    val plan = IntervalJoin.intervalJoin(events)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(plan.contains("Generate explode(sequence("), plan.take(1200))
  }
}
