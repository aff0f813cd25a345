package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Retention, ZOrder, ZoneMapPrune}

/** Zone-map prune audit: cross-derivation from the shipped zorder_plan
  * zone maps + a raw-event matched recount, the zone-map soundness
  * invariant (matched ⊆ scanned), and the probe-fact-only plan shape.
  */
class ZoneMapPruneSpec extends AnyFunSuite {
  import SparkTestSession._

  private def probeBounds(lo_u: Long, hi_u: Long, lo_d: Long, hi_d: Long) = Seq(
    ("center_cell", lo_u + 7 * (hi_u - lo_u) / 16, lo_u + 9 * (hi_u - lo_u) / 16,
      lo_d + 7 * (hi_d - lo_d) / 16, lo_d + 9 * (hi_d - lo_d) / 16),
    ("narrow_user", lo_u, lo_u + (hi_u - lo_u) / 8, lo_d, hi_d),
    ("point_user", lo_u, lo_u, lo_d, hi_d),
    ("recent_days", lo_u, hi_u, hi_d - (hi_d - lo_d) / 8, hi_d))

  test("gate: every row cross-derives from zorder_plan's zone maps + a raw recount") {
    val ev = Tables.events(spark, sf)
    val raw = ev.selectExpr("user_id", s"unix_micros(ts) div ${Retention.UsPerDay}")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val zones = ZOrder.zorderPlanQ(ev).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val probes = probeBounds(raw.map(_._1).min, raw.map(_._1).max,
      raw.map(_._2).min, raw.map(_._2).max)
    val expected = probes.sortBy(_._1).map { case (p, uLo, uHi, dLo, dHi) =>
      val scanned = zones.filter { case (_, mnU, mxU, mnD, mxD) =>
        !(mxU < uLo || mnU > uHi || mxD < dLo || mnD > dHi) }
      val rowsScanned = scanned.map(_._1).sum
      val matched = raw.count { case (u, d) =>
        u >= uLo && u <= uHi && d >= dLo && d <= dHi }.toLong
      (p, zones.length.toLong, scanned.length.toLong,
        zones.length.toLong - scanned.length, raw.length.toLong, rowsScanned,
        matched, (rowsScanned - matched) * 1000000L / math.max(rowsScanned, 1L))
    }
    val out = ZoneMapPrune.zoneMapPruneQ(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(out == expected)
    // zone-map soundness: every matching row lives in a scanned bucket
    out.foreach { r => assert(r._7 <= r._6, s"matched > scanned in $r") }
    // ...and the audit is non-vacuous here: some probe prunes something
    assert(out.exists(_._4 > 0))
  }

  test("plan: only probe-fact nested loops (4-row broadcast), no data x data product") {
    val plan = ZoneMapPrune.zoneMapPruneQ(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    // three fact-class loops: zones x 4-row probes, corpus x 4-row probes
    // (range residual), and zorder's own 1-row stats normalization fact
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nl <= 3, s"expected <=3 fact-class nested loops, saw $nl\n" + plan.take(1200))
  }
}
