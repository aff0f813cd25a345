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

  private def run2(counts: Seq[Int]): Seq[(Long, Long, Long, Long)] = {
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("a", d.toLong * 86400000000L + 1L))
    }
    val df = rows.toDF("event_type", "t_us")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
    ChangePoint.changePoint2(df).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
  }

  test("binary segmentation: spike+step reports BOTH shifts, hand-computed") {
    // rank 1 = the step (day 4, 256 — the single-split test above); the
    // left segment [2,2,10,2,2] then re-scores: T=18, m=5 → scores
    // 8,16,16,8 → earliest-day tie-break picks day 1 at 16. The right
    // segment (8 days of 10) is flat — all zeros.
    assert(run2(Seq(2, 2, 10, 2, 2, 10, 10, 10, 10, 10, 10, 10, 10)) ==
      Seq((1L, 4L, 256L, 13L), (2L, 1L, 16L, 5L)))
  }

  test("binary segmentation: spike-only rank 2 flags the spike's leading edge") {
    // rank 1 = the spike mass boundary (day 2, 336); left segment
    // [2,2,50]: T=54, m=3 → scores |6-54|=48, |12-108|=96 → day 1 at 96
    // beats the flat right segment's zeros.
    assert(run2(Seq(2, 2, 50, 2, 2, 2, 2, 2, 2, 2)) ==
      Seq((1L, 2L, 336L, 10L), (2L, 1L, 96L, 3L)))
  }

  test("binary segmentation: flat series is all-zero with earliest-day tie-breaks") {
    // rank 1: day 0 (score 0, whole series); left segment has one
    // position (no candidate), right segment [pos 2..4] is flat → rank 2
    // day 1 at 0 with seg_days 3.
    assert(run2(Seq(3, 3, 3, 3)) == Seq((1L, 0L, 0L, 4L), (2L, 1L, 0L, 3L)))
  }

  test("spike only: single-split CUSUM is spike-sensitive by design") {
    // counts 2,2,50,2,2,2,2,2,2,2 (n=10, S_n=68). score(i)=|S_i·10−i·68|:
    // i=2:96, i=3:|540−204|=336 (max), i=4:288. A 48-unit spike IS the
    // dominant single level shift under CUSUM — the robust companion for
    // reading trend THROUGH spikes is robust_trend (Theil–Sen). Means:
    // before 54·1000/3=18000, after 14·1000/7=2000.
    assert(run(Seq(2, 2, 50, 2, 2, 2, 2, 2, 2, 2)) ==
      (2L, 336L, 10L, 18000L, 2000L))
  }

  test("sustained step dominates a small spike") {
    // counts 2,2,10,2,2 then 8 days of 10 (n=13, S_n=98): a +8 spike at
    // day 2 vs a 2→10 step sustained 8 days. score(i)=|S_i·13−i·98|:
    // spike split i=3: |14·13−3·98|=112; step boundary i=5:
    // |18·13−5·98|=256 (max; i=4:184, i=6:224, i=7:192). Means:
    // before 18·1000/5=3600, after 80·1000/8=10000.
    assert(run(Seq(2, 2, 10, 2, 2, 10, 10, 10, 10, 10, 10, 10, 10)) ==
      (4L, 256L, 13L, 3600L, 10000L))
  }
}
