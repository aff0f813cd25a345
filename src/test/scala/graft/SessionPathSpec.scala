package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SessionPath, Sessionize}

class SessionPathSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf)

  test("planted: paths follow event-time order and sessions split on the gap") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val gapS = Sessionize.GapUs / 1000000L
    val ev = Seq(
      // user 1, session 1: a > b (out-of-row-order timestamps)
      (2L, t(20), 1L, "b", 0.0),
      (1L, t(10), 1L, "a", 0.0),
      // user 1, session 2 (beyond the gap): a > b again
      (3L, t(20 + gapS + 100), 1L, "a", 0.0),
      (4L, t(20 + gapS + 200), 1L, "b", 0.0),
      // user 2: lone c
      (5L, t(10), 2L, "c", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = SessionPath.sessionPaths(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a>b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("planted: equal timestamps order by event_id inside the path") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (9L, t(10), 1L, "z", 0.0),
      (8L, t(10), 1L, "y", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = SessionPath.sessionPaths(ev).collect()
    assert(got.head.getString(0) == "y>z")
  }

  test("gate events: top-k bounded, counts reconcile with session count") {
    val rows = SessionPath.sessionPathsQ(events).collect()
    assert(rows.nonEmpty && rows.length <= SessionPath.TopK)
    // counts non-increasing, path tie-break ascending
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) > b.getLong(2) ||
          (a.getLong(2) == b.getLong(2) && a.getString(0) < b.getString(0)))
      case _ => ()
    }
    // every reported path's length matches its separator count
    rows.foreach { r =>
      assert(r.getLong(1) == r.getString(0).split(">").length.toLong)
    }
    // top paths can't exceed the total session count
    val nSessions = Sessionize.sessionize(events).count()
    assert(rows.map(_.getLong(2)).sum <= nSessions)
  }

  test("plan: top-k via TakeOrderedAndProject, no global sort") {
    val p = SessionPath.sessionPathsQ(events).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }
}
