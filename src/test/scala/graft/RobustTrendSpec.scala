package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RobustTrend

/** Theil–Sen semantics on planted series: exact slope on a clean linear
  * ramp, ROBUSTNESS (one wild day barely moves the median where a mean
  * slope would be dragged), the lower-median convention on an even pair
  * count, and the negative-slope sign factoring. */
class RobustTrendSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** counts(i) events on day i (one row per event at noon of that day). */
  private def series(tpe: String, counts: Seq[Int]): Seq[(String, Long)] =
    counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)((tpe, d.toLong * 86400000000L + 43200000000L))
    }

  private def run(rows: Seq[(String, Long)]): Map[String, (Long, Long)] = {
    val df: DataFrame = rows.toDF("event_type", "t_us")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
    RobustTrend.robustTrend(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("clean ramp: slope exactly 1000 milli/day; pair count C(4,2)") {
    assert(run(series("a", Seq(1, 2, 3, 4))) == Map("a" -> (6L, 1000L)))
  }

  test("one wild day: median slope stays at the ramp, unlike a mean") {
    // days 0..4 counts 1,2,3,100,5 — pairwise slopes through day 3 are
    // huge but a minority (4 of 10); median still reads the ramp.
    val got = run(series("a", Seq(1, 2, 3, 100, 5)))("a")
    assert(got._1 == 10L)
    assert(got._2 >= 1000L && got._2 <= 2000L,
      s"median dragged by the outlier: $got")
  }

  test("negative trend: sign factoring gives exact negative milli-slope") {
    assert(run(series("a", Seq(9, 7, 5, 3)))("a") == (6L, -2000L))
  }

  test("lower median on an even pair count") {
    // 3 days, counts 1,2,4 -> slopes: d01=1000, d12=2000, d02=1500;
    // odd count picks 1500. Add day 3 count 4 -> 6 slopes sorted
    // (0,666,1000,1000,1500,2000) -> lower median (idx (6-1)/2=2) = 1000.
    assert(run(series("a", Seq(1, 2, 4, 4)))("a") == (6L, 1000L))
  }
}
