package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CharDiversity

/** Char-level Simpson collision: planted gibberish classes the token
  * gates can't see, full Scala recount of the run-length fold, totality,
  * and the zero-exchange plan shape.
  */
class CharDiversitySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted: glyph spam and ab-floods flagged; natural text passes") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps going"),
      (2L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (3L, "ababababababababababababababab"),
      (4L, "--- --- --- --- --- --- --- ---"),
      (5L, "AaAaA aAaAa"),      // case-folds to one glyph
      (6L, null.asInstanceOf[String]),
      (7L, "   \t  "))
      .toDF("doc_id", "text")
    val out = CharDiversity.charDiversityQ(df).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(!out(1L)._5, "natural text flagged")
    assert(out(1L)._4 < 150000, s"natural collision ${out(1L)._4} implausibly high")
    assert(out(2L) == ((36L, 1L, 36L * 36L, 1000000L, true)), "pure glyph spam")
    assert(out(3L)._4 == 500000L && out(3L)._5, "ab-flood at exactly half collision")
    assert(out(4L)._5, "separator flood passed")
    assert(out(5L)._4 == 1000000L && out(5L)._5, "case-folded single glyph")
    assert(out(6L) == ((0L, 0L, 0L, 0L, false)), "NULL text not total")
    assert(out(7L) == ((0L, 0L, 0L, 0L, false)), "whitespace-only not total")
  }

  test("gate corpus: fold recomputes exactly against a plain Scala count") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val out = CharDiversity.charDiversityQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    texts.foreach { case (id, t) =>
      val cs = Option(t).getOrElse("").toLowerCase.replaceAll("\\s+", "")
      val counts = cs.groupBy(identity).map(_._2.length.toLong)
      val n = cs.length.toLong
      val d = counts.map(c => c * c).sum
      val ppm = if (n == 0) 0L else d * 1000000L / (n * n)
      assert(out(id) == ((n, counts.size.toLong, d, ppm)), s"doc $id mismatch")
    }
  }

  test("plan: zero exchanges before the output sort") {
    val plan = CharDiversity.charDiversity(docs)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(l => l.startsWith("Exchange") || l.startsWith("BroadcastExchange"))
    assert(exchanges == 0, s"expected pure map pass:\n$plan")
  }
}
