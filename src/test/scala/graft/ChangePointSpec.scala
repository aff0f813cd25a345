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

  private def runK(counts: Seq[Int]): Seq[(Long, Long, Long, Long)] = {
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(("a", d.toLong * 86400000000L + 1L))
    }
    val df = rows.toDF("event_type", "t_us")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
    ChangePoint.changePointK(df).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
  }

  test("K=4 segmentation: three planted shifts found in dominance order, hand-computed") {
    // Four 4-day blocks at levels 2, 10, 4, 20 (n=16, S_n=144); prefix
    // masses 2,4,6,8 | 18,28,38,48 | 52,56,60,64 | 84,104,124,144.
    // Round 1, score(i)=|S_i·16 − i·144|: i=4:448, i=5:432, i=11:624,
    // i=12:|1024−1728|=704 (max), i=13:528 → rank 1 = day 11, 704, 16.
    // Round 2: right segment [13..16] is flat (0s); left [1..12]
    // rescores to the classic |S_i·12 − i·64|: max 160 at i=4 → rank 2
    // = day 3, 160, 12. Round 3: [5..12] (t=56, m=8, local s_i−8):
    // i=8: |40·8 − 4·56| = 96 (max) → rank 3 = day 7, 96, 8. Round 4:
    // all four segments flat → score-0 earliest-day tie-break lands on
    // i=1 (day 0) in segment [1..4] → rank 4 = day 0, 0, 4.
    assert(runK(Seq(2, 2, 2, 2, 10, 10, 10, 10, 4, 4, 4, 4, 20, 20, 20, 20)) ==
      Seq((1L, 11L, 704L, 16L), (2L, 3L, 160L, 12L), (3L, 7L, 96L, 8L),
        (4L, 0L, 0L, 4L)))
  }

  test("K form at ranks 1-2 reproduces binary segmentation exactly") {
    for (counts <- Seq(
      Seq(2, 2, 10, 2, 2, 10, 10, 10, 10, 10, 10, 10, 10),
      Seq(2, 2, 50, 2, 2, 2, 2, 2, 2, 2),
      Seq(3, 3, 3, 3))) {
      val k12 = runK(counts).filter(_._1 <= 2L)
      assert(k12 == run2(counts), s"K-form ranks 1-2 diverge on $counts: $k12")
    }
  }

  test("K=4 emission is sparse: a 2-day series yields only rank 1") {
    // rank 1 splits [1..2]; both induced segments are single-position →
    // rounds 2-4 have no candidates anywhere.
    assert(runK(Seq(2, 9)) == Seq((1L, 0L, 7L, 2L)))
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
