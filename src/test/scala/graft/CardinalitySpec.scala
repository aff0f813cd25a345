package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CardinalityReport

/** Cardinality report: hand-computed planted strata, a full Scala recount
  * at gate scale, and the HLL sketch path's error measured against exact.
  */
class CardinalitySpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted strata: distincts, duplication factor, NULL-text source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b b c", "en", "s1"),
      (2L, "a b b c", "en", "s1"),      // exact dup of 1
      (3L, "A  b b  c ", "en", "s1"),   // whitespace/case variant — same fp
      (4L, "x y", "en", "s2"),
      (5L, null.asInstanceOf[String], "en", "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = CardinalityReport.cardinalityReportQ(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    // s1: 3 docs, 1 distinct fp; 12 tokens, 3 distinct; dup_factor 3
    assert(rows("s1") == (3L, 1L, 12L, 3L, 0.25, 3.0))
    assert(rows("s2") == (1L, 1L, 2L, 2L, 1.0, 1.0))
    // NULL text: fp of '' counts as one distinct doc, zero tokens
    assert(rows("s3") == (1L, 1L, 0L, 0L, 0.0, 1.0))
  }

  test("gate corpus: exact counts match a Scala recount") {
    val docs = Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> Option(r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val toks = rows.flatMap(_._2.toSeq)
        .flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      val fps = rows.map(_._2.getOrElse("").replaceAll("\\s+", " ").trim.toLowerCase)
      src -> (rows.size.toLong, fps.distinct.size.toLong,
        toks.size.toLong, toks.distinct.size.toLong)
    }
    val got = CardinalityReport.cardinalityReportQ(Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (s, e) => assert(got(s) == e, s"source $s") }
  }

  test("HLL sketch path: per-source relative error within the configured rsd band") {
    val exact = CardinalityReport.cardinalityReport(Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> (r.getLong(2).toDouble, r.getLong(4).toDouble)).toMap
    val approx = CardinalityReport.cardinalityReportApprox(Tables.documents(spark, sf))
      .collect().map(r => r.getString(0) -> (r.getLong(2).toDouble, r.getLong(4).toDouble)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (s, (ed, et)) =>
      val (ad, at) = approx(s)
      // 3 standard errors at rsd=0.05 (plus integer slack on tiny counts)
      assert(math.abs(ad - ed) <= 3 * 0.05 * ed + 2, s"$s docs: $ad vs $ed")
      assert(math.abs(at - et) <= 3 * 0.05 * et + 2, s"$s tokens: $at vs $et")
    }
  }
}
