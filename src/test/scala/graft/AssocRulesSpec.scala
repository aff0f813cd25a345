package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AssocRules, Sessionize}

/** Session-basket association rules: planted basket algebra (per-session
  * once-counting, session-gap boundaries, directional confidences) and a
  * full Scala recount over the gate corpus's session baskets.
  */
class AssocRulesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def df(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, tSec, et), i) =>
      (i.toLong, new Timestamp(tSec * 1000L), u, et, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("planted: once-per-session counting, gap splits, ppm confidences") {
    val gapSec = Sessionize.GapUs / 1000000L
    // u1 session A: view, click, view (pair view-click once);
    // u1 session B (after gap): view only;
    // u2 session C: click, click (no pair — single item)
    val rows = Seq[(Long, Long, String)](
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "view"),
      (1L, 20L + gapSec + 100L, "view"),
      (2L, 0L, "click"), (2L, 5L, "click"))
    val out = AssocRules.assocRulesQ(df(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == (("click", "view")))
    // c_ab=1 (session A), c_click=2 (A, C), c_view=2 (A, B), n_sessions=3
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((1L, 2L, 2L, 3L)))
    assert(r.getLong(6) == 1000000L / 3L, "support_ppm")
    assert(r.getLong(7) == 500000L, "conf click->view")
    assert(r.getLong(8) == 500000L, "conf view->click")
    assert(r.getDouble(9) == math.round(1.0 * 3 / (2 * 2) * 1e4) / 1e4, "lift")
  }

  test("gate corpus: rules match a Scala recount over sessionized baskets") {
    val tagged = Sessionize.sessionTagged(Tables.events(spark, sf))
      .select("user_id", "session_seq", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val sessions = tagged.map(t => (t._1, t._2))
    val n = sessions.size.toLong
    val typeC = tagged.groupBy(_._3).map { case (t, v) => t -> v.size.toLong }
    val pairC = sessions.toSeq.flatMap { case (u, s) =>
      val items = tagged.collect { case (`u`, `s`, et) => et }.toSeq.sorted
      for { i <- items.indices; j <- (i + 1) until items.size } yield (items(i), items(j))
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val expected = pairC.toSeq.map { case ((a, b), cab) =>
      (a, b, cab, typeC(a), typeC(b), n, cab * 1000000L / n,
        cab * 1000000L / typeC(a), cab * 1000000L / typeC(b),
        math.round(cab.toDouble * n / (typeC(a) * typeC(b)) * 1e4) / 1e4)
    }.sortBy(t => (t._1, t._2))
    val got = AssocRules.assocRulesQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getDouble(9))).toSeq
    assert(got == expected)
  }
}
