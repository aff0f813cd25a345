package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobustOutlier

/** Median/MAD outlier gate: planted masking case (the spike the z-score
  * gate loses to σ-inflation is caught; flat group flags nothing), full
  * Scala recount of the doubled-integer algebra, one-exchange plan.
  */
class RobustOutlierSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  private def df(rows: Seq[(Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.map { case (id, u, et, v) => (id, new Timestamp(id * 1000L), u, et, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("planted: spike flagged, flat group silent, moderate values pass") {
    val base = (1L to 20L).map(i => (i, 1L, "view", 10.0 + 0.01 * (i % 5)))
    val spike = Seq((21L, 1L, "view", 500.0))
    val flat = (31L to 40L).map(i => (i, 2L, "click", 7.77)) :+
      ((41L, 2L, "click", 9999.0))
    val out = RobustOutlier.eventOutlierMadQ(df(base ++ spike ++ flat)).collect()
      .map(r => r.getLong(0) -> r.getBoolean(7)).toMap
    assert(out(21L), "spike not flagged")
    assert((1L to 20L).forall(i => !out(i)), "in-band value flagged")
    // group 2 is majority-constant → mad4 = 0 → the guard silences ALL
    // verdicts including the huge one (silver's σ=0 convention)
    assert((31L to 41L).forall(i => !out(i)), "flat-group verdict not silenced")
  }

  test("gate corpus: full integer recount of med2/d2/mad4 and every verdict") {
    def medianInt(xs: Seq[Long]): Long = {
      // exact median of an EVEN-scaled integer list (input guaranteed even
      // or doubled by the caller) — midpoint of the two middles is integral
      val s = xs.sorted
      val n = s.size
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val evs = events.select(col("event_id"), col("user_id"), col("event_type"),
      expr("CAST(round(value * 100.0) AS BIGINT) * 2").as("c2")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = evs.groupBy(e => (e._2, e._3)).flatMap { case (_, rows) =>
      val med2 = medianInt(rows.map(_._4).toSeq)
      val d2s = rows.map(e => e._1 -> math.abs(e._4 - med2))
      val mad4 = medianInt(d2s.map(_._2 * 2).toSeq)
      d2s.toSeq.map { case (id, d2) =>
        id -> ((med2, d2, mad4, mad4 > 0 && 2 * d2 > RobustOutlier.K * mad4))
      }
    }.toMap
    val out = RobustOutlier.eventOutlierMadQ(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
      .toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (id, want) =>
      assert(out(id) == want, s"event $id: ${out(id)} != $want")
    }
    assert(out.values.exists(_._4), "no outlier at gate scale — gate untested")
  }

  test("plan: two chained percentile windows + verdict ride ONE exchange") {
    val plan = RobustOutlier.eventOutlierMad(events)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(_.startsWith("Exchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
