package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** The native session_window twin's contract: bit-identical rows to the
  * hand-rolled window algebra on the gate corpus, and the µs boundary
  * semantics pinned on planted exact-gap fixtures (the gap is passed to
  * session_window VERBATIM: its inclusive session end — merge at ≤ gap is
  * false, i.e. split strictly greater — coincides with the hand-rolled
  * "split at > gap" rule, so no boundary adjustment is needed). */
class SessionNativeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("native session_window twin is row-identical to the window-algebra form") {
    val events = Tables.events(spark, sf)
    val a = Sessionize.sessionizeQ(events).collect().map(_.toString).toSeq
    val b = Sessionize.sessionizeNativeQ(events).collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b,
      s"native diverges: ${b.size} vs ${a.size} rows")
  }

  test("boundary: exactly-gap pair merges, gap+1µs pair splits — both forms") {
    val g = Sessionize.GapUs
    val ev = Seq(
      (1L, 0L, 1L, "click", 1.0), (2L, g, 1L, "click", 1.0),       // ≤ gap: one session
      (3L, 0L, 2L, "click", 1.0), (4L, g + 1, 2L, "click", 1.0))   // > gap: two sessions
      .toDF("event_id", "t_us", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = Set((1L, 0L, g, 2L), (2L, 0L, 0L, 1L), (2L, g + 1, g + 1, 1L))
    assert(sessions(Sessionize.sessionize(ev)) == want, "window form boundary moved")
    assert(sessions(Sessionize.sessionizeNative(ev)) == want, "native boundary mapping wrong")
  }
}
