package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LengthQuantiles, TextOps}

/** Rank-selected quantiles: planted small-group selection cases (index
  * arithmetic at n=1,2,4), full Scala recount on the gate corpus, and
  * the one-exchange plan.
  */
class LengthQuantilesSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted: selection indexes at tiny n; ties broken by doc_id") {
    import spark.implicits._
    // words(n) tokenizes to 2n BPE-ish tokens (the pattern splits the
    // letter run from the digit run in "w7").
    // source a: counts 20,40,60,80 → p25 idx (3*25)/100=0 → 20;
    // p50 idx 1 → 40; p75 idx 2 → 60; p95 idx 2 → 60
    // source b: one doc → every quantile = its count
    // source c: two equal counts → tie broken by doc_id, both values equal
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, "a", words(10)), (2L, "a", words(20)), (3L, "a", words(30)), (4L, "a", words(40)),
      (5L, "b", words(7)),
      (6L, "c", words(3)), (7L, "c", words(3)))
      .toDF("doc_id", "source", "text")
    val out = LengthQuantiles.lengthQuantilesQ(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("a") == ((4L, 20L, 40L, 60L, 60L)), s"source a ${out("a")}")
    assert(out("b") == ((1L, 14L, 14L, 14L, 14L)))
    assert(out("c") == ((2L, 6L, 6L, 6L, 6L)))
  }

  test("gate corpus: every quantile recomputes from a plain sorted list") {
    val pat = TextOps.BpePattern
    val rows = docs.select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).getOrElse("")))
    val expected = rows.groupBy(_._1).map { case (src, rs) =>
      val counts = rs.map { case (_, id, t) =>
        (pat.r.findAllIn(t).size.toLong, id)
      }.sortBy(identity).map(_._1)
      val n = counts.length
      def sel(p: Int) = counts(((n - 1) * p / 100).toInt)
      src -> ((n.toLong, sel(25), sel(50), sel(75), sel(95)))
    }
    val out = LengthQuantiles.lengthQuantilesQ(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out == expected)
  }

  test("plan: count window + rank sort + agg ride ONE exchange") {
    val plan = LengthQuantiles.lengthQuantiles(docs)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(_.startsWith("Exchange"))
    assert(exchanges == 1, s"expected 1 source exchange, got $exchanges:\n$plan")
  }
}
