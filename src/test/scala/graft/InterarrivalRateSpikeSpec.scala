package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Interarrival, RateSpike}

/** Inter-arrival histogram + rate-spike verdicts: planted bucket/baseline
  * algebra and Scala recounts over the gate corpus.
  */
class InterarrivalRateSpikeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def df(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, tSec, et), i) =>
      (i.toLong, new Timestamp(tSec * 1000L), u, et, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("planted interarrival: per-(user,type) streams, power-of-two buckets") {
    // u1 views at 0, 1, 5, 70 → gaps 1, 4, 65 → buckets 1, 4, 64;
    // u2 views at 0, 0 → gap 0 → bucket 0; cross-user gaps must not exist
    val rows = Seq[(Long, Long, String)](
      (1L, 0L, "view"), (1L, 1L, "view"), (1L, 5L, "view"), (1L, 70L, "view"),
      (2L, 100000L, "view"), (2L, 100000L, "view"))
    val out = Interarrival.eventInterarrivalQ(df(rows)).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("view", 0L) -> ((1L, 250000L)),
      ("view", 1L) -> ((1L, 250000L)),
      ("view", 4L) -> ((1L, 250000L)),
      ("view", 64L) -> ((1L, 250000L))))
  }

  test("planted rate_spike: warmup gate, spike and drop cross-products") {
    val day = 86400L
    // 'err': days 0-7 have 2/day (baseline 14), day 8 has 5 (7*5=35 > 2*14=28
    // AND n>=5 → spike), day 9 has 1 (trail7 = 2*6+5 = 17 ≥ 14; 14*1=14 < 17
    // → drop), day 10 has 0 (trail7 = 2*5+5+1 = 16; 0 < 16 → drop)
    val rows: Seq[(Long, Long, String)] =
      (0L to 7L).flatMap(d => Seq((1L, d * day, "err"), (2L, d * day + 1, "err"))) ++
        (1L to 5L).map(i => (1L, 8L * day + i, "err")) ++
        Seq((1L, 9L * day, "err"), (1L, 10L * day + 5, "view"))
    val out = RateSpike.rateSpikeQ(df(rows)).collect()
      .filter(_.getString(0) == "err")
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap
    assert(out(7L) == ((2L, 14L, false, false)), s"day7 ${out(7L)}")
    assert(out(8L) == ((5L, 14L, true, false)), s"day8 ${out(8L)}")
    assert(out(9L) == ((1L, 17L, false, true)), s"day9 ${out(9L)}")
    // day 6 is pre-warmup: no verdict even though trail7 is partial
    assert(out(6L) == ((2L, 12L, false, false)), s"day6 ${out(6L)}")
  }

  test("gate corpus: interarrival recount") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts) AS t_us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val gaps = evs.groupBy(e => (e._1, e._2)).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._3))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (a._2, (b._4 - a._4) / 1000000L) }
    }
    val bounds = Interarrival.BucketBounds
    def bucket(g: Long): Long =
      bounds.sliding(2).collectFirst { case Seq(lo, hi) if g < hi => lo }
        .getOrElse(bounds.last)
    val byType = gaps.groupBy(_._1)
    val expected = byType.toSeq.flatMap { case (t, gs) =>
      val counts = gs.map(g => bucket(g._2)).groupBy(identity)
        .map { case (b, v) => b -> v.size.toLong }
      val tot = gs.size.toLong
      counts.toSeq.map { case (b, c) => (t, b, c, c * 1000000L / tot) }
    }.sortBy(t => (t._1, t._2))
    val got = Interarrival.eventInterarrivalQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("gate corpus: rate_spike recount") {
    val evs = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 AS day")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val daily = evs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = evs.map(_._1).distinct.sorted.flatMap { t =>
      val days = evs.filter(_._1 == t).map(_._2)
      val (lo, hi) = (days.min, days.max)
      (lo to hi).map { d =>
        val n = daily.getOrElse((t, d), 0L)
        val trail7 = (d - 7 to d - 1).map(x => daily.getOrElse((t, x), 0L)).sum
        val warm = d >= lo + 7
        (t, d, n, trail7,
          warm && n >= RateSpike.MinSpikeCount && 7 * n > 2 * trail7,
          warm && trail7 >= 14 && 14 * n < trail7)
      }
    }.toSeq
    val got = RateSpike.rateSpikeQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toSeq
    assert(got == expected)
  }
}
