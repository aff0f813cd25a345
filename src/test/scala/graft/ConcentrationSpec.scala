package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Concentration

/** Concentration report: hand-computed planted Gini/top-share cases,
  * the equal-distribution zero, a full Scala recount on the gate
  * events, and the shared-exchange window shape.
  */
class ConcentrationSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "user_id", "value")
  }

  test("planted: [1,1,1,7] → gini 450 pm, top shares 700000 ppm") {
    // masses in cents: 100, 100, 100, 700 → x_ppm = [1e5,1e5,1e5,7e5]
    // gini = 2*3.4e6/(4*1e6) - 5/4 = 0.45; top1%/10% cut = 1 user = 700/1000
    val out = Concentration.concentrationReportQ(ev(Seq(
      ("a", 1L, 1.0), ("a", 2L, 1.0), ("a", 3L, 1.0), ("a", 4L, 7.0)))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 4L && r.getLong(2) == 1000L)
    assert(r.getLong(3) == 700000L && r.getLong(4) == 700000L)
    assert(r.getLong(5) == 450L)
  }

  test("planted: equal masses → gini 0; per-type independence") {
    val out = Concentration.concentrationReportQ(ev(Seq(
      ("a", 1L, 5.0), ("a", 2L, 5.0),
      ("b", 1L, 1.0), ("b", 2L, 3.0)))).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(out("a") == 0L)
    // b: x=[250000,750000], Σix=1750000, num=2*1750000-3*1000000=500000
    //    gini_pm = 5e8 div 2e6 = 250
    assert(out("b") == 250L)
  }

  test("gate: full Scala recount of every type's row") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "CAST(round(value * 100.0) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rs) =>
      val mass = rs.groupBy(_._2).map { case (u, xs) => u -> xs.map(_._3).sum }.toSeq
      val n = mass.size.toLong
      val total = mass.map(_._2).sum
      val asc = mass.sortBy { case (u, m) => (m, u) }
      val desc = mass.sortBy { case (u, m) => (-m, u) }
      def topMass(k: Long) = desc.take(k.toInt).map(_._2).sum
      val xp = asc.map { case (_, m) => m * 1000000L / total }
      val ixp = xp.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val sxp = xp.sum
      val gini = (2 * ixp - (n + 1) * sxp) * 1000L / math.max(n * sxp, 1L)
      (t, n, total,
        topMass(math.max(n / 100, 1)) * 1000000L / total,
        topMass(math.max(n / 10, 1)) * 1000000L / total, gini)
    }
    val out = Concentration.concentrationReportQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == expected)
  }

  test("plan: the four windows share one event_type exchange") {
    val plan = Concentration.concentrationReportQ(Tables.events(spark, sf))
      .queryExecution.executedPlan.toString
    // type-only partitioning (the (event_type, user_id) mass agg is the
    // other, separate data-scaled exchange)
    val ex = "Exchange hashpartitioning\\(event_type#\\d+, \\d+\\)".r.findAllIn(plan).size
    assert(ex == 1, s"expected 1 type exchange, saw $ex\n" + plan.take(1200))
  }
}
