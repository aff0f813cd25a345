package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LangConfusion, TextOps, Twap}

/** TWAP step-integral arithmetic + the lang confusion rollup, each
  * recounted in plain Scala on the gate tables.
  */
class TwapLangConfusionSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)
  private lazy val docs = Tables.documents(spark, sf)

  test("twap planted: durations weigh values; single-event span-0 reads 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 1.00),
      (2L, "2024-01-01 00:00:10", 1L, 3.00),
      (3L, "2024-01-01 00:00:20", 1L, 9.99),  // last: zero duration
      (4L, "2024-01-01 00:00:05", 2L, 5.00))  // single event
      .toDF("event_id", "ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val out = Twap.twapQ(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // (100*10s + 300*10s) / 20s = 200 cents
    assert(out(1L) == ((3L, 20000000L, 200L)))
    assert(out(2L) == ((1L, 0L, 0L)))
  }

  test("twap gate: integral recomputes from a plain Scala fold") {
    val rows = events.select(col("user_id"), col("event_id"),
      expr("unix_micros(ts)"), expr("CAST(round(value * 100.0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).map { case (u, rs) =>
      val ord = rs.sortBy(e => (e._3, e._2))
      val span = ord.last._3 - ord.head._3
      val wsum = ord.zip(ord.tail).map { case (a, b) => a._4 * (b._3 - a._3) }.sum
      u -> ((rs.length.toLong, span, wsum / math.max(span, 1L)))
    }
    val out = Twap.twapQ(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == expected)
  }

  test("twap plan: lead window and per-user agg share one exchange") {
    val plan = Twap.twap(events).queryExecution.executedPlan.toString
    val ex = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(_.startsWith("Exchange hashpartitioning(user_id"))
    assert(ex == 1, s"expected 1 user exchange, got $ex:\n$plan")
  }

  test("lang confusion: cells recompute from langId; rows sum to corpus") {
    val li = TextOps.langId(docs).select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = li.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rowTot = counts.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val expected = counts.map { case ((l, p), n) =>
      (l, p) -> ((n, n * 1000000L / rowTot(l)))
    }
    val out = LangConfusion.langConfusionQ(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == expected)
    assert(out.values.map(_._1).sum == docs.count())
  }
}
