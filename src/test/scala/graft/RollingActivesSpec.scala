package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RollingActives

/** Rolling DAU/WAU: planted trailing-window algebra (silent-day zero rows,
  * window expiry at exactly +7 days, same-day repeats count once) and a
  * full Scala recount of the gate matrix.
  */
class RollingActivesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def df(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, day), i) =>
      (i.toLong, new Timestamp(day * 86400L * 1000L + 3600L * 1000L), u, "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("planted: dense axis, window expiry, silent-day zeros") {
    // u1 active days 0 and 10 (twice on day 10 — counts once);
    // u2 active days 0 and 1
    val rows = Seq[(Long, Long)](
      (1L, 0), (1L, 10), (1L, 10), (2L, 0), (2L, 1))
    val out = RollingActives.rollingActivesQ(df(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = Map(
      0L -> ((2L, 2L)), 1L -> ((1L, 2L)),
      2L -> ((0L, 2L)), 3L -> ((0L, 2L)), 4L -> ((0L, 2L)),
      5L -> ((0L, 2L)), 6L -> ((0L, 2L)),
      7L -> ((0L, 1L)), // u2's day-1 activity still inside [1, 7]
      8L -> ((0L, 0L)), 9L -> ((0L, 0L)), // nothing within 6 days back
      10L -> ((1L, 1L)))
    assert(out == expected)
    assert(out.keySet == (0L to 10L).toSet, "axis must be dense")
  }

  test("gate corpus: full Scala recount of DAU/WAU") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val days = ud.map(_._2)
    val expected = (days.min to days.max).map { d =>
      val wau = ud.collect { case (u, ad) if ad >= d - 6 && ad <= d => u }.size
      val dau = ud.collect { case (u, ad) if ad == d => u }.size
      (d, dau.toLong, wau.toLong)
    }
    val got = RollingActives.rollingActivesQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }
}
