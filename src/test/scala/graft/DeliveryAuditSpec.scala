package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventDedup, LateArrival}

/** Delivery audits: planted duplicate-delivery and out-of-order cases
  * (the gate stream is clean — both audits read 0 there, which the
  * gate tests pin as the honest baseline), plus content-key exactness.
  */
class DeliveryAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(rows: Seq[(Long, Long, String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "s", "value")
      .withColumn("ts", col("s").cast("timestamp"))
  }

  test("event_dedup_report planted: retries collapse on the content key") {
    val out = EventDedup.eventDedupReportQ(ev(Seq(
      // same (user, type, ts, value) under three broker ids → 1 logical
      (1L, 1L, "click", "2024-01-01 00:00:00", 1.0),
      (2L, 1L, "click", "2024-01-01 00:00:00", 1.0),
      (9L, 1L, "click", "2024-01-01 00:00:00", 1.0),
      // value differs by a cent → distinct logical event
      (3L, 1L, "click", "2024-01-01 00:00:00", 1.01),
      (4L, 2L, "view", "2024-01-01 00:00:00", 1.0)))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      ("click", 4L, 2L, 2L, 500000L),
      ("view", 1L, 1L, 0L, 0L)))
  }

  test("late_arrival_audit planted: lateness vs the per-user arrival watermark") {
    // user 1 arrival order (event_id): t=100s, t=40s (60s late), t=70s
    // (30s late vs hwm 100s), t=200s (on time)
    val out = LateArrival.lateArrivalAuditQ(ev(Seq(
      (1L, 1L, "click", "2024-01-01 00:01:40", 1.0),
      (2L, 1L, "click", "2024-01-01 00:00:40", 1.0),
      (3L, 1L, "click", "2024-01-01 00:01:10", 1.0),
      (4L, 1L, "click", "2024-01-01 00:03:20", 1.0),
      (5L, 2L, "view", "2024-01-01 00:00:00", 1.0)))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("click", 4L, 2L, 500000L, 60000000L, 90000000L),
      ("view", 1L, 0L, 0L, 0L, 0L)))
  }

  test("gate: the synthetic stream is clean — both audits read zero, counts total") {
    val evt = Tables.events(spark, sf)
    val total = evt.count()
    val dedup = EventDedup.eventDedupReportQ(evt).collect()
    assert(dedup.map(_.getLong(1)).sum == total)
    assert(dedup.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
    val late = LateArrival.lateArrivalAuditQ(evt).collect()
    assert(late.map(_.getLong(1)).sum == total)
    assert(late.forall(r => r.getLong(2) == 0L && r.getLong(4) == 0L))
  }

  test("plan: one exchange each — content-key agg / user watermark window") {
    val d = EventDedup.eventDedupReportQ(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!d.contains("Join"), d.take(600))
    val l = LateArrival.lateArrivalAuditQ(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!l.contains("Join"), l.take(600))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(l).size == 1, l.take(900))
  }
}
