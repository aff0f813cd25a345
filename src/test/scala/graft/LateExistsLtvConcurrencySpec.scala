package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LateExists, SessionConcurrency, Sessionize, UserLtv}

/** Q4-class EXISTS screen, session concurrency curve, user LTV frame:
  * planted algebra + gate recounts.
  */
class LateExistsLtvConcurrencySpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted q4: once-per-order counting, boundary at exactly +30d") {
    import spark.implicits._
    val day = 86400L * 1000L
    val orders = Seq(
      (1L, "P1", new Timestamp(0L)),        // two late lines -> counts once
      (2L, "P1", new Timestamp(0L)),        // line at exactly +30d -> late
      (3L, "P1", new Timestamp(0L)),        // line at +29d -> not late
      (4L, "P2", new Timestamp(0L)))        // no lines at all
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val lineitem = Seq(
      (1L, new Timestamp(31L * day)), (1L, new Timestamp(40L * day)),
      (2L, new Timestamp(30L * day)),
      (3L, new Timestamp(29L * day)))
      .toDF("l_orderkey", "l_shipdate")
    val out = LateExists.q4LateExistsQ(orders, lineitem).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("P1") == ((3L, 2L, 666666L)), s"P1 ${out("P1")}")
    assert(out("P2") == ((1L, 0L, 0L)), s"P2 ${out("P2")}")
  }

  test("gate corpus: q4 recount") {
    val os = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderpriority",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS od")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ls = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS sd")
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSeq }
    val cut = LateExists.LateDays.toLong * 86400000000L
    val expected = os.groupBy(_._2).toSeq.map { case (p, ords) =>
      val late = ords.count(o => ls.getOrElse(o._1, Seq.empty[Long]).exists(_ >= o._3 + cut))
      (p, ords.size.toLong, late.toLong, late.toLong * 1000000L / ords.size)
    }.sortBy(_._1)
    val got = LateExists.q4LateExistsQ(Tables.orders(spark, sf), Tables.lineitem(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("gate corpus: concurrency curve cross-derived from sessionize") {
    val sess = Sessionize.sessionize(Tables.events(spark, sf))
      .select("user_id", "session_start_us", "session_end_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val h = SessionConcurrency.UsPerHour
    val spans = sess.flatMap { case (u, s, e) => (s / h to e / h).map(hr => (hr, u)) }
    val expected = spans.groupBy(_._1).toSeq.map { case (hr, v) =>
      (hr, v.size.toLong, v.map(_._2).distinct.size.toLong)
    }.sortBy(_._1)
    val got = SessionConcurrency.sessionConcurrencyQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("gate corpus: LTV recount") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 AS day",
        "CAST(round(value * 100.0) AS BIGINT) AS cents", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toSeq.map { case (u, es) =>
      val days = es.map(_._2)
      val cents = es.map(_._3).sum
      val ad = days.distinct.size.toLong
      (u, days.min, days.max, days.max - days.min + 1, ad, es.size.toLong, cents,
        es.filter(_._4 == "purchase").map(_._3).sum, cents / ad)
    }.sortBy(_._1)
    val got = UserLtv.userLtvQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got == expected)
  }
}
