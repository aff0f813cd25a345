package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VocabGrowth

/** Vocabulary growth curve: planted prefix arithmetic, full-corpus row
  * cross-checked against direct distinct counts, monotonicity.
  */
class VocabGrowthSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: first-doc membership decides every prefix") {
    import spark.implicits._
    // 8 docs (ids 0..7): term 'z' first appears in doc 4 → absent from
    // the 1/8,1/4,1/2 prefixes; 'a' is everywhere
    val docs = (0L to 7L).map(i =>
      (i, if (i >= 4) "a z" else "a b")).toSeq.toDF("doc_id", "text")
    val out = VocabGrowth.vocabGrowthCurveQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 2L, 2L),    // doc 0: terms a,b
      (2L, 2L, 4L, 2L),
      (4L, 4L, 8L, 2L),
      (8L, 8L, 16L, 3L)))  // z enters at doc 4
  }

  test("gate: the full-corpus row equals direct counts; curve is monotone") {
    val d = Tables.documents(spark, sf)
    val out = VocabGrowth.vocabGrowthCurveQ(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    Seq(out.map(_._2), out.map(_._3), out.map(_._4)).foreach { c =>
      c.toSeq.sliding(2).foreach(w => assert(w.head <= w.last, "curve not monotone"))
    }
    val full = out.last
    assert(full._2 == d.count())
    val direct = d.selectExpr(
      "explode(coalesce(split(lower(trim(text)), '\\\\s+'), array())) AS t")
    assert(full._4 == direct.distinct().count())
    assert(full._3 == direct.count())
  }
}
