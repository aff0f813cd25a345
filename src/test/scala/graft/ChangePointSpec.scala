package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangePoint

/** CUSUM argmax semantics on planted series: a clean step maximizes at
  * the step (hand-computed score), a flat series scores zero with the
  * earliest-day tie-break, and segment means are exact integers. */
class ChangePointSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(counts: Seq[Int]): (Long, Long, Long, Long, Long) = {
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("a", d.toLong * 86400000000L + 1L))
    }
    val df = rows.toDF("event_type", "t_us")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
    val r = ChangePoint.changePoint(df).collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
  }

  test("clean step 2→10: split at the last low day, hand-computed score") {
    // S_5=10, n=10, S_n=60 → score(5)=|10·10−5·60|=200; means 2000/10000
    assert(run(Seq(2, 2, 2, 2, 2, 10, 10, 10, 10, 10)) ==
      (4L, 200L, 10L, 2000L, 10000L))
  }

  test("flat series: zero score everywhere, earliest-day tie-break") {
    val (day, score, n, mb, ma) = run(Seq(3, 3, 3, 3))
    assert((day, score, n) == (0L, 0L, 4L) && mb == 3000L && ma == 3000L)
  }

  test("single spike does not beat a genuine step") {
    // counts: 2,2,50,2,2,10,10,10,10,10 — spike at day 2, step at day 5.
    // The CUSUM prefix statistic integrates mass: verify split lands at
    // the step boundary region (day >= 4), not the spike day itself.
    val (day, _, _, _, _) = run(Seq(2, 2, 50, 2, 2, 10, 10, 10, 10, 10))
    assert(day != 2L, s"split landed on the spike day: $day")
  }
}
