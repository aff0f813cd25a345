package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NormalizationFunnel, ShipLatency, ValueDrift}

/** Value drift, normalization funnel, ship latency: gate-corpus recounts
  * + monotonicity invariants.
  */
class DriftFunnelLatencySpec extends AnyFunSuite {
  import SparkTestSession._

  test("gate corpus: value drift recount") {
    val evs = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) AS t_us",
        "CAST(round(value * 100.0) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (lo, hi) = (evs.map(_._2).min, evs.map(_._2).max)
    val bounds = ValueDrift.BucketBounds
    def bucket(c: Long): Long =
      bounds.sliding(2).collectFirst { case Seq(a, b) if c < b => a }
        .getOrElse(bounds.last)
    val expected = evs.map(_._1).distinct.sorted.map { t =>
      val rows = evs.filter(_._1 == t)
      val halves = rows.groupBy(e => if (e._2 * 2 < lo + hi) 0 else 1)
      def ppm(h: Int): Map[Long, Long] = {
        val hr = halves.getOrElse(h, Array.empty[(String, Long, Long)])
        val n = hr.length.toLong
        hr.groupBy(e => bucket(e._3)).map { case (b, v) =>
          b -> v.size.toLong * 1000000L / n
        }
      }
      val (a, b) = (ppm(0), ppm(1))
      val buckets = a.keySet ++ b.keySet
      val tv = buckets.toSeq.map(k =>
        math.abs(a.getOrElse(k, 0L) - b.getOrElse(k, 0L))).sum / 2
      (t, tv, buckets.size.toLong)
    }.toSeq
    val got = ValueDrift.valueDriftQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("gate corpus: normalization funnel recount and monotonicity") {
    val texts = Tables.documents(spark, sf).select("text").collect()
      .map(r => Option(r.getString(0)).getOrElse(""))
    def collapse(s: String) = s.replaceAll("\\s+", " ").trim
    val dRaw = texts.distinct.size.toLong
    val dLower = texts.map(_.toLowerCase).distinct.size.toLong
    val dWs = texts.map(t => collapse(t.toLowerCase)).distinct.size.toLong
    val dAlnum = texts.map(t =>
      collapse(t.toLowerCase.replaceAll("[^a-z0-9 ]", ""))).distinct.size.toLong
    val r = NormalizationFunnel.normalizationFunnelQ(Tables.documents(spark, sf))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((texts.length.toLong, dRaw, dLower, dWs, dAlnum)))
    assert(r.getLong(5) == dRaw - dLower && r.getLong(6) == dLower - dWs &&
      r.getLong(7) == dWs - dAlnum)
    assert(dRaw >= dLower && dLower >= dWs && dWs >= dAlnum, "funnel must be monotone")
  }

  test("gate corpus: ship latency recount (negative latencies truncate toward zero)") {
    val fs = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "unix_micros(CAST(l_shipdate AS TIMESTAMP)) AS s")
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)).min }
    val os = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderpriority",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) AS od")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lat = os.flatMap { case (k, p, od) =>
      fs.get(k).map(s => (k, p, (s - od) / 86400000000L)) // Scala / truncates
    }
    assert(lat.exists(_._3 < 0), "corpus must exercise the negative branch")
    val expected = lat.groupBy(_._2).toSeq.map { case (p, v) =>
      val sorted = v.sortBy(e => (e._3, e._1)).map(_._3)
      val n = sorted.length.toLong
      def at(pc: Int) = sorted((((n - 1) * pc) / 100).toInt)
      (p, n, sorted.min, at(50), at(90), sorted.max)
    }.sortBy(_._1)
    val got = ShipLatency.shipLatencyQ(Tables.orders(spark, sf), Tables.lineitem(spark, sf))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }
}
