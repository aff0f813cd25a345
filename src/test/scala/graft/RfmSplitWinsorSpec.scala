package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, RfmSegment, SplitRepair, TextOps, Winsorize}

/** RFM segmentation, split repair, winsorization: gate-corpus recounts
  * plus targeted invariants (repair closes all cross-split clusters;
  * winsorized mass bounded by raw mass extremes).
  */
class RfmSplitWinsorSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gate corpus: RFM recount") {
    val os = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 AS day",
        "CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cust = os.groupBy(_._1).map { case (c, v) =>
      (c, v.map(_._2).max, v.size.toLong, v.map(_._3).sum)
    }.toSeq
    val refDay = cust.map(_._2).max
    val base = cust.map { case (c, ld, f, m) => (c, refDay - ld, f, m) }
    val n = base.size.toLong
    def qs(vs: Seq[Long]): (Long, Long, Long) = {
      val s = vs.sorted
      def at(p: Int) = s((((n - 1) * p) / 100).toInt)
      (at(25), at(50), at(75))
    }
    val (r25, r50, r75) = qs(base.map(_._2))
    val (f25, f50, f75) = qs(base.map(_._3))
    val (m25, m50, m75) = qs(base.map(_._4))
    def sc(v: Long, q: (Long, Long, Long), inv: Boolean): Int = {
      val raw = if (v <= q._1) 1 else if (v <= q._2) 2 else if (v <= q._3) 3 else 4
      if (inv) 5 - raw else raw
    }
    val expected = base.map { case (_, r, f, m) =>
      ((sc(r, (r25, r50, r75), inv = true), sc(f, (f25, f50, f75), inv = false),
        sc(m, (m25, m50, m75), inv = false)), m)
    }.groupBy(_._1).map { case ((rs, fs, ms), v) =>
      (rs, fs, ms, v.size.toLong, v.map(_._2).sum)
    }.toSeq.sortBy(t => (t._1, t._2, t._3))
    val got = RfmSegment.rfmSegmentQ(Tables.orders(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("rfm offset algebra == window twin at numParts in {1,3,8,32}; no unpartitioned window in the plan") {
    val orders = Tables.orders(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toSet
    val window = rows(RfmSegment.rfmSegmentWindow(orders))
    Seq(1, 3, 8, 32).foreach { p =>
      assert(rows(RfmSegment.rfmSegment(orders, numParts = p)) == window,
        s"numParts=$p diverged from the window twin")
    }
    // the r16 weak finding stays fixed: zero unpartitioned WindowExec —
    // every window in the registered plan is keyed by (dim[, pid])
    val plan = RfmSegment.rfmSegmentQ(orders)
      .queryExecution.executedPlan.toString()
    val bad = plan.linesIterator.filter(_.contains("Window"))
      .filter(l => l.contains("windowspecdefinition()") ||
        (!l.contains("dim") && l.contains("windowspecdefinition")))
      .toSeq
    assert(bad.isEmpty, s"unpartitioned window in rfm plan:\n$bad")
  }

  test("gate corpus: split repair closes every cross-split cluster") {
    val docs = Tables.documents(spark, sf)
    val out = SplitRepair.splitRepairQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    // after repair, each cluster has exactly one split
    out.groupBy(_._2).foreach { case (cl, rows) =>
      assert(rows.map(_._4).distinct.size == 1, s"cluster $cl split not unified")
    }
    // new split is the canonical's OLD split; moved <=> old != new
    val oldSplit = out.map(r => r._1 -> r._3).toMap
    out.foreach { case (doc, cl, old, nw, moved) =>
      assert(nw == oldSplit(cl), s"doc $doc new_split != canonical's split")
      assert(moved == (old != nw), s"doc $doc moved flag")
    }
    // cross-derivation: membership matches dedup_cluster, splits corpus_split
    val clusters = Dedup.dedupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val splits = TextOps.corpusSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.map(r => r._1 -> r._2).toMap == clusters)
    out.foreach { case (doc, _, old, _, _) => assert(old == splits(doc)) }
  }

  test("gate corpus: winsorize recount") {
    val vs = Tables.events(spark, sf)
      .selectExpr("event_type", "CAST(round(value * 100.0) AS BIGINT) AS cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = vs.groupBy(_._1).toSeq.map { case (t, v) =>
      val s = v.map(_._2).sorted
      val n = s.length.toLong
      val lo = s((((n - 1) * Winsorize.LoPct) / 100).toInt)
      val hi = s((((n - 1) * Winsorize.HiPct) / 100).toInt)
      (t, n, lo, hi, s.count(_ < lo).toLong, s.count(_ > hi).toLong,
        s.sum, s.map(c => math.max(math.min(c, hi), lo)).sum)
    }.sortBy(_._1)
    val got = Winsorize.winsorizeQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
  }
}
