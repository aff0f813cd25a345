package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Burstiness, ZipfCheck}

/** Dispersion and rank-frequency semantics, hand-computed: the Fano
  * factor is 0 for a constant series, (n−1)·mean-scaled for a one-day
  * burst, and counts silent days as real zeros; the Zipf probe emits
  * exact integer doubling ratios with deterministic tie-breaks and
  * sparse emission where rank 2r doesn't exist. */
class SeriesHealthSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def dayEvents(counts: Seq[(Long, Int)]) =
    counts.flatMap { case (d, c) => Seq.fill(c)(("a", d * 86400000000L + 1L)) }
      .toDF("event_type", "t_us")
      .withColumn("ts", expr("timestamp_micros(t_us)"))

  private def fano(df: org.apache.spark.sql.DataFrame) = {
    val r = Burstiness.eventBurstiness(df).collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
  }

  test("constant series: Fano exactly 0 (regular traffic)") {
    assert(fano(dayEvents((0L to 3L).map(_ -> 3))) == ((4L, 12L, 3000L, Some(0L))))
  }

  test("bursty series: hand-computed dispersion; a single-day span is trivially regular") {
    // days 0 and 2 observed (8 and 1 events) → dense 8,0,1: n=3, Σx=9,
    // Σx²=65 → fano = (3·65 − 81)·1000 div (3·9) = 114000 div 27 = 4222
    assert(fano(dayEvents(Seq(0L -> 8, 2L -> 1))) ==
      ((3L, 9L, 3000L, Some(4222L))))
    // one observed day: span [0,0], variance 0 → fano 0
    assert(fano(dayEvents(Seq(0L -> 9))) == ((1L, 9L, 9000L, Some(0L))))
  }

  test("silent days are real zeros in the dispersion") {
    // days 0,2 at 4 each → dense 4,0,4: n=3, Σx=8, Σx²=32 →
    // fano = (96−64)·1000 div 24 = 1333; mean_milli = 2666
    assert(fano(dayEvents(Seq(0L -> 4, 2L -> 4))) ==
      ((3L, 8L, 2666L, Some(1333L))))
  }

  test("zipf probe: exact doubling ratios, sparse emission past the vocabulary") {
    // frequencies 8,4,2,1 for terms a,b,c,d → rank 1 ratio 8/4 =
    // 2,000,000 ppm; rank 2 ratio 4/f(4)=4/1 = 4,000,000 ppm; rank 4
    // has no rank-8 twin → not emitted
    val docs = Seq((1L, ("a " * 8 + "b " * 4 + "c " * 2 + "d").trim))
      .toDF("doc_id", "text")
    val got = ZipfCheck.zipfCheck(docs).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "a", 8L, 4L, 2000000L),
      (2L, "b", 4L, 1L, 4000000L)), s"zipf probes: $got")
  }

  test("zipf probe: frequency ties rank deterministically by term") {
    // all four terms at freq 2: ranks a=1,b=2,c=3,d=4 → rank-1 ratio
    // f(a)/f(b) = 1,000,000; rank-2 ratio f(b)/f(d) = 1,000,000
    val docs = Seq((1L, "a a b b c c d d")).toDF("doc_id", "text")
    val got = ZipfCheck.zipfCheck(docs).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSeq
    assert(got == Seq((1L, "a", 1000000L), (2L, "b", 1000000L)), s"ties: $got")
  }
}
