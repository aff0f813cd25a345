package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DupSpans, ParagraphDedup}

/** Maximal duplicate-span merge: planted merge/split/cap semantics and the
  * structural contract (spans reconstruct the dup-window set exactly and
  * are maximal — never adjacent) against the gate corpus's verdicts.
  */
class DupSpansSpec extends AnyFunSuite {
  import SparkTestSession._

  private val A = "a1 a2 a3 a4 a5 a6 a7 a8"
  private val B = "b1 b2 b3 b4 b5 b6 b7 b8"
  private val C = "c1 c2 c3 c4 c5 c6 c7 c8"
  private val D = "d1 d2 d3 d4 d5 d6 d7 d8"
  private val E = "e1 e2 e3 e4 e5 e6 e7 e8"

  test("planted fixture: adjacent dups merge, gaps split, short-window cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$A $B $C $D"),      // all first occurrences → no spans
      (2L, s"$A $B $E $C"),      // dup,dup,fresh,dup → spans [0,1] and [3,3]
      (3L, s"$C z1 z2"),         // dup + fresh short window → span [0,0]
      (4L, s"$D w1 w2 w3"),      // first occurrence of the 11-token shape
      (5L, s"$D w1 w2 w3"),      // full copy of doc 4: span [0,1], end capped at 11
      (6L, null)                 // NULL text → no windows, no rows
    ).toDF("doc_id", "text")
    val rows = DupSpans.dupSpanMergeQ(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5)))
    assert(!rows.exists(_._1 == 1L))
    assert(!rows.exists(_._1 == 6L))
    assert(rows.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0, 1, 2L, 0, 16), (2L, 3, 3, 1L, 24, 32)))
    assert(rows.filter(_._1 == 3L).toSeq == Seq((3L, 0, 0, 1L, 0, 8)))
    assert(rows.filter(_._1 == 5L).toSeq == Seq((5L, 0, 1, 2L, 0, 11)),
      "end_token capped at the doc's token count on a short last window")
  }

  test("gate corpus: spans reconstruct the dup-window set and are maximal") {
    val spans = DupSpans.dupSpanMerge(Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .groupBy(_._1)
    val dupIdx = ParagraphDedup.paragraphVerdicts(Tables.documents(spark, sf))
      .filter(col("is_dup")).select("doc_id", "para_idx").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(spans.keySet == dupIdx.keySet)
    spans.foreach { case (doc, ss) =>
      val covered = ss.flatMap(s => s._2 to s._3).toSet
      assert(covered == dupIdx(doc), s"doc $doc: spans must cover exactly the dup windows")
      assert(ss.map(s => s._3 - s._2 + 1L).sum == ss.map(_._4).sum,
        s"doc $doc: n_windows equals span width (runs are contiguous)")
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(y._2 > x._3 + 1, s"doc $doc: adjacent spans must have merged")
        case _ =>
      }
    }
  }
}
