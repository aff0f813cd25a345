package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusDiff, VocabDrift}

/** Vocabulary drift: planted add/drop/move arithmetic, a full Scala
  * recount over the synthetic version history, and the top-K plan shape
  * (TakeOrderedAndProject, no global sort).
  */
class VocabDriftSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted: status classes and exact ppm deltas") {
    import spark.implicits._
    // old: x x y | z  → counts x2 y1 z1, N=4
    // new: x y y | w  → counts x1 y2 w1, N=4
    val oldSnap = Seq((1L, "x x y"), (2L, "z")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "x y y"), (3L, "w")).toDF("doc_id", "text")
    val out = VocabDrift.vocabDrift(oldSnap, newSnap).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
    // all |delta| = 250000 → tie-break on term: w x y z
    assert(out.map(_._1).toSeq == Seq("w", "x", "y", "z"))
    val m = out.toMap
    assert(m("w") == (("added", 0L, 1L, 0L, 250000L, 250000L)))
    assert(m("x") == (("shared", 2L, 1L, 500000L, 250000L, -250000L)))
    assert(m("y") == (("shared", 1L, 2L, 250000L, 500000L, 250000L)))
    assert(m("z") == (("dropped", 1L, 0L, 250000L, 0L, -250000L)))
  }

  test("gate corpus: top-K recomputes from a plain Scala count") {
    def counts(rows: Array[(Long, String)]): Map[String, Long] =
      rows.flatMap { case (_, t) =>
        Option(t).getOrElse("").toLowerCase.trim.split("\\s+").filter(_.nonEmpty)
      }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    def snap(df: org.apache.spark.sql.DataFrame): Array[(Long, String)] =
      df.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)).orNull))
    val oc = counts(snap(CorpusDiff.oldSnapshot(docs)))
    val nc = counts(snap(CorpusDiff.newSnapshot(docs)))
    val (nOld, nNew) = (oc.values.sum max 1L, nc.values.sum max 1L)
    val expected = (oc.keySet ++ nc.keySet).toSeq.map { t =>
      val (o, n) = (oc.getOrElse(t, 0L), nc.getOrElse(t, 0L))
      val status =
        if (oc.contains(t) && nc.contains(t)) "shared"
        else if (nc.contains(t)) "added" else "dropped"
      val (op, np) = (o * 1000000L / nOld, n * 1000000L / nNew)
      (t, status, o, n, op, np, np - op)
    }.sortBy { case (t, _, _, _, _, _, d) => (-math.abs(d), t) }.take(VocabDrift.TopK)
    val out = VocabDrift.vocabDriftQ(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(out == expected)
  }

  test("plan: top-K is TakeOrderedAndProject, totals are the only nested loops") {
    val plan = VocabDrift.vocabDriftQ(docs).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nl <= 2, s"expected <=2 one-row total joins, saw $nl")
  }
}
