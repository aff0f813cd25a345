package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, ThresholdSweep}

/** Threshold sweep: planted exact-jaccard boundary cases, monotone
  * curve + the τ=0.8 row count pinned equal to the SHIPPED
  * dedup_ngram_jaccard (one contract), and the 1-row sweep shape.
  */
class ThresholdSweepSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("planted: inclusive integer cuts at exact jaccard values") {
    // pair (1,2): bigrams {ab,bc,cd} vs {ab,bc,ce} → inter 2, union 4, j=0.5
    // pair (3,4): identical texts → j=1.0
    // doc 5 shares nothing
    val out = ThresholdSweep.dedupThresholdSweepQ(docs(Seq(
      (1L, "a b c d"), (2L, "a b c e"),
      (3L, "x y z"), (4L, "x y z"),
      (5L, "q r s")))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // j=0.5 passes ONLY the 50 cut (inclusive); j=1.0 passes all
    // avg at 50: (500 + 1000) div 2 = 750; above: 1000
    assert(out.toSeq == Seq(
      (50L, 2L, 750L), (60L, 1L, 1000L), (70L, 1L, 1000L),
      (80L, 1L, 1000L), (90L, 1L, 1000L)))
  }

  test("gate: monotone curve; the τ=0.8 row equals the shipped operator's pair count") {
    val d = Tables.documents(spark, sf)
    val out = ThresholdSweep.dedupThresholdSweepQ(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).toSeq == Seq(50L, 60L, 70L, 80L, 90L))
    val counts = out.map(_._2).toSeq
    counts.sliding(2).foreach(w => assert(w.head >= w.last))
    val shipped = Dedup.ngramJaccardQ(d).count()
    assert(out.find(_._1 == 80L).get._2 == shipped)
  }

  test("plan: the sweep itself is a 1-row agg — no window, no added exchange class") {
    val plan = ThresholdSweep.dedupThresholdSweepQ(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
  }
}
