package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ContributionCap

class ContributionCapSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf)

  test("planted: first-k-by-time kept, overflow dropped, cents exact") {
    // user 1: 4 events of type "a" (k=2 keeps the two EARLIEST); user 2:
    // one event — under cap, fully kept
    def t(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (10L, t(40), 1L, "a", 4.0),   // rn 4 → dropped
      (11L, t(10), 1L, "a", 1.0),   // rn 1 → kept
      (12L, t(20), 1L, "a", 2.0),   // rn 2 → kept
      (13L, t(30), 1L, "a", 3.0),   // rn 3 → dropped
      (14L, t(10), 2L, "b", 9.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = ContributionCap.contributionCap(ev, k = 2)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a", 2L, 2L, 300L, 1L),   // kept cents = 100 + 200
      ("b", 1L, 0L, 950L, 1L)))
  }

  test("planted: equal-ts events break ties by event_id") {
    def t(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (22L, t(10), 1L, "a", 2.0),
      (21L, t(10), 1L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = ContributionCap.contributionCap(ev, k = 1).collect()
    assert(got.head.getLong(3) == 100L, "lower event_id must win the tie")
  }

  test("gate events: kept + dropped reconciles, per-user cap holds") {
    val out = ContributionCap.contributionCapQ(events).collect()
    val raw = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == raw(r.getString(0)),
        s"${r.getString(0)}: kept+dropped != raw")
    }
    // total kept ≤ users × k
    val users = events.select("user_id").distinct().count()
    assert(out.map(_.getLong(1)).sum <= users * ContributionCap.K.toLong)
    // and the cap binds on this corpus (otherwise the operator is vacuous)
    assert(out.map(_.getLong(2)).sum > 0, "nothing dropped — cap never binds")
  }

  test("plan: user window + type rollup, no joins") {
    val p = ContributionCap.contributionCapQ(events).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    // user window + countDistinct's two-phase (type, user) pre-agg +
    // type rollup + final sort — the distinct expansion is Spark's
    // standard distributed distinct, not an accident
    val shuffles = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(p).length
    assert(shuffles <= 4, s"unexpected shuffles:\n$p")
  }
}
