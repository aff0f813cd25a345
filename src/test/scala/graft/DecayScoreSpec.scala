package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DecayScore

/** Decayed engagement: planted dyadic-weight algebra (k = age div 7,
  * truncating integer division, underflow-to-zero at deep ages) and a
  * full Scala recount of the gate frame.
  */
class DecayScoreSpec extends AnyFunSuite {
  import SparkTestSession._

  private def df(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, day, v), i) =>
      (i.toLong, new Timestamp(day * 86400L * 1000L + 3600L * 1000L), u, "view", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("planted: half-life buckets, truncation, deep-age underflow") {
    // ref_day = 300. u1: day 300 (k=0, full), day 286 (age 14, k=2, /4),
    // day 293 (age 7, k=1, 300c/2 exact); u2: day 0 (age 300, k=42→cap 40,
    // 100c·10⁶ div 2⁴⁰ = 0 — underflow)
    val rows = Seq[(Long, Long, Double)](
      (1L, 300, 2.0), (1L, 286, 1.0), (1L, 293, 3.0), (2L, 0, 1.0))
    val out = DecayScore.eventDecayScoreQ(df(rows)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // u1: 200e6 + 100e6/4 + 300e6/2 = 200e6 + 25e6 + 150e6 = 375e6
    assert(out(1L) == ((300L, 3L, 600L, 375000000L)), s"u1 ${out(1L)}")
    assert(out(2L) == ((0L, 1L, 100L, 0L)), s"u2 ${out(2L)}")
  }

  test("gate corpus: full Scala recount of the decay frame") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val refDay = evs.map(_._2).max
    val expected = evs.groupBy(_._1).map { case (u, es) =>
      val dec = es.map { case (_, d, c) =>
        val k = math.min((refDay - d) / DecayScore.HalfLifeDays, 40L)
        c * 1000000L / (1L << k)
      }.sum
      (u, es.map(_._2).max, es.size.toLong, es.map(_._3).sum, dec)
    }.toSeq.sortBy(_._1)
    val got = DecayScore.eventDecayScoreQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }
}
