package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Funnel, FunnelLatency}

/** Funnel latency: planted rank-selected quantiles, a Scala recount on
  * the gate events, and the shared transition exchange.
  */
class FunnelLatencySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  test("planted: per-transition latency quantiles by rank selection") {
    import spark.implicits._
    def ev(id: Long, t: String, u: Long, ty: String) = (id, t, u, ty)
    val df = Seq(
      // users 1..3 convert view->click in 10/20/30 s; user 1 purchases 5 s later
      ev(1, "2024-01-01 00:00:00", 1, "view"), ev(2, "2024-01-01 00:00:10", 1, "click"),
      ev(3, "2024-01-01 00:00:15", 1, "purchase"),
      ev(4, "2024-01-01 00:00:00", 2, "view"), ev(5, "2024-01-01 00:00:20", 2, "click"),
      ev(6, "2024-01-01 00:00:00", 3, "view"), ev(7, "2024-01-01 00:00:30", 3, "click"),
      ev(8, "2024-01-01 00:00:00", 4, "purchase")) // out of order: no conversion
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = FunnelLatency.funnelLatencyQ(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // n=3 → p50 idx (2*50)div100=1 → rank 2 → 20 s; p90 idx 1 → 20 s
    assert(out("view->click") == ((3L, 10000000L, 20000000L, 20000000L, 30000000L)))
    assert(out("click->purchase") == ((1L, 5000000L, 5000000L, 5000000L, 5000000L)))
  }

  test("gate events: quantiles recompute from the funnel output") {
    val f = Funnel.eventFunnel(events)
      .select("user_id", "t0_us", "t1_us", "t2_us").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val trans = Seq(
      "view->click" -> f.flatMap(u => for (a <- u._2; b <- u._3) yield (b - a, u._1)),
      "click->purchase" -> f.flatMap(u => for (a <- u._3; b <- u._4) yield (b - a, u._1)))
    val expected = trans.filter(_._2.nonEmpty).map { case (t, ls) =>
      val s = ls.sorted.map(_._1)
      val n = s.length
      def sel(p: Int) = s(((n - 1) * p / 100).toInt)
      t -> ((n.toLong, s.min, sel(50), sel(90), s.max))
    }.toMap
    val out = FunnelLatency.funnelLatencyQ(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out == expected)
  }

  test("plan: count window + rank sort + agg share one transition exchange") {
    val plan = FunnelLatency.funnelLatency(events)
      .queryExecution.executedPlan.toString
    val ex = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(_.startsWith("Exchange hashpartitioning(transition"))
    assert(ex == 1, s"expected 1 transition exchange, got $ex:\n$plan")
  }
}
