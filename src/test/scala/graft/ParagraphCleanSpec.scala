package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ParagraphClean, ParagraphDedup}

/** Surgical window removal: planted keep/cut/degenerate cases, and a full
  * cross-derivation of every cleaned doc from the verdict set + raw
  * tokens on the gate corpus.
  */
class ParagraphCleanSpec extends AnyFunSuite {
  import SparkTestSession._

  private val A = "a1 a2 a3 a4 a5 a6 a7 a8"
  private val B = "b1 b2 b3 b4 b5 b6 b7 b8"
  private val C = "c1 c2 c3 c4 c5 c6 c7 c8"

  test("planted fixture: dup windows cut, survivors rejoin in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$A $B"),            // all first occurrences → unchanged
      (2L, s"$A $C $B"),         // middle window fresh, outer two dup → keeps C
      (3L, s"$A $B"),            // full copy → everything cut
      (4L, s"$C x1 x2"),         // dup window + fresh short tail → keeps tail
      (5L, null)                 // NULL text → '' with zero counts
    ).toDF("doc_id", "text")
    val out = ParagraphClean.paragraphCleanQ(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((s"$A $B", 2L, 0L, 16L)))
    assert(out(2L) == ((C, 3L, 2L, 8L)))
    assert(out(3L) == (("", 2L, 2L, 0L)))
    assert(out(4L) == (("x1 x2", 2L, 1L, 2L)), "short last window keeps its true length")
    assert(out(5L) == (("", 0L, 0L, 0L)))
  }

  test("gate corpus: cleaned text equals the verdict-filtered re-window") {
    val width = ParagraphDedup.ParaWindowTokens
    val dupIdx = ParagraphDedup.paragraphVerdicts(Tables.documents(spark, sf))
      .filter(col("is_dup")).select("doc_id", "para_idx").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expected = Tables.documents(spark, sf).select("doc_id", "text").collect().map { r =>
      val id = r.getLong(0)
      val toks = Option(r.getString(1))
        .map(_.trim.toLowerCase.split("\\s+").toSeq).getOrElse(Seq.empty)
      val paras = toks.grouped(width).map(_.mkString(" ")).toSeq
      val dup = dupIdx.getOrElse(id, Set.empty)
      val kept = paras.zipWithIndex.collect { case (p, i) if !dup.contains(i) => p }
      id -> ((kept.mkString(" "), paras.size.toLong, dup.size.toLong,
        kept.map(_.split(" ").length.toLong).sum))
    }.toMap
    val got = ParagraphClean.paragraphClean(Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
  }
}
