package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Attribution, PositionalAttribution}

/** Positional attribution: planted U-shape credits incl. the remainder
  * rule, exact conservation on the gate stream, and total agreement
  * with the last-touch model (same purchase mass, different split).
  */
class PositionalAttributionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(rows: Seq[(Long, Long, String, String, Double)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    rows.toDF("event_id", "user_id", "event_type", "s", "value")
      .withColumn("ts", col("s").cast("timestamp"))
  }

  test("planted: U-shape 40/20/40, remainder to last touch, edge journey sizes") {
    def t(i: Int) = f"2024-01-01 00:${i}%02d:00"
    val out = PositionalAttribution.attributionPositionalQ(ev(Seq(
      // u1: 4 touches then a 1.03 purchase: first 41, mids 5+5, last 41+1
      (1L, 1L, "view", t(1), 0.0), (2L, 1L, "click", t(2), 0.0),
      (3L, 1L, "click", t(3), 0.0), (4L, 1L, "view", t(4), 0.0),
      (5L, 1L, "purchase", t(5), 1.03),
      // u2: no touches → _none gets the full 2.00
      (6L, 2L, "purchase", t(1), 2.0),
      // u3: one touch → it gets the full 0.50
      (7L, 3L, "view", t(1), 0.0), (8L, 3L, "purchase", t(2), 0.5),
      // u4: touch AFTER the purchase credits nobody
      (9L, 4L, "purchase", t(1), 1.0), (10L, 4L, "click", t(2), 0.0)))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // u1: mids = (103-82) div 2 = 10 each → wait: pool 21, mid 10, r=1
    // first(view)=41, mid click 10 + mid click 10, last(view)=41+1=42
    // u4's purchase has no touches → _none 100
    assert(out.toSeq == Seq(
      ("_none", 2L, 300L),
      ("click", 2L, 20L),
      ("view", 3L, 41L + 42L + 50L)))
  }

  test("gate: exact conservation and agreement with last-touch on total mass") {
    val evt = Tables.events(spark, sf)
    val out = PositionalAttribution.attributionPositionalQ(evt).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val credited = out.map(_._2).sum
    val purchases = evt
      .selectExpr("CAST(round(value * 100.0) AS BIGINT)", "event_type")
      .collect().filter(_.getString(1) == "purchase").map(_.getLong(0)).sum
    assert(credited == purchases,
      s"conservation broke: credited $credited vs purchases $purchases")
    val lastTouchTotal = Attribution.attributionLastTouchQ(evt).collect()
      .map(_.getLong(2)).sum
    assert(credited == lastTouchTotal)
    // multi-channel split is live on the gate stream
    assert(out.count(_._1 != "_none") >= 2)
  }
}
