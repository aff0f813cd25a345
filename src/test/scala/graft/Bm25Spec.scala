package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** The two effects that distinguish BM25 from keyword_search's tf·idf,
  * pinned on planted docs: length normalization (b dial) and tf
  * saturation (k1 dial), plus the b=0 switch-off and gate-shape sanity. */
class Bm25Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source")

  private def scores(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(1) -> r.getLong(5)).toMap

  test("length normalization: same tf, shorter doc scores strictly higher") {
    val s = scores(Bm25.bm25Rank(docs(
      1L -> "spark",
      2L -> "spark x1 x2 x3 x4 x5 x6 x7")))
    assert(s(1L) > s(2L), s"short doc must outrank long: $s")
  }

  test("b=0 disables the length effect: same tf scores equal at any length") {
    val s = scores(Bm25.bm25Rank(docs(
      1L -> "spark",
      2L -> "spark x1 x2 x3 x4 x5 x6 x7"), bm = 0L))
    assert(s(1L) == s(2L), s"b=0 must ignore length: $s")
  }

  test("tf saturation: doubling tf earns less than double the score") {
    val s = scores(Bm25.bm25Rank(docs(
      1L -> "spark pad",
      2L -> "spark spark")))
    assert(s(2L) > s(1L) && s(2L) < 2 * s(1L),
      s"tf=2 must gain, sub-linearly: $s")
  }

  test("gate shape: dense ranks, descending integer scores, K-bounded") {
    val out = Bm25.bm25RankQ(Tables.documents(spark, sf)).collect()
    assert(out.nonEmpty && out.length <= Bm25.TopK)
    assert(out.map(_.getInt(0)).toSeq == (1 to out.length), "ranks not dense")
    val si = out.map(_.getLong(5)).toSeq
    assert(si == si.sorted.reverse, "score_i not descending")
  }
}
