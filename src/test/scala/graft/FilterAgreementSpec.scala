package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FilterAgreement, LmScore, TextOps}

/** Filter-agreement contingency: cross-derived cell-for-cell from the two
  * shipped per-doc signals, threshold selection verified by rank, planted
  * disagreement corpus.
  */
class FilterAgreementSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  private def expectedFrom(src: org.apache.spark.sql.DataFrame) = {
    val lm = LmScore.lmScoreQ(src).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) / math.max(r.getLong(1), 1L)) / FilterAgreement.BucketWidth)
      .toMap
    val q = TextOps.textQualityQ(src).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(8), r.getInt(1).toLong)).toMap
    val n = lm.size
    val sortedB = lm.values.toSeq.sorted
    val tb = sortedB(((n - 1) * FilterAgreement.LowPct / 100).toInt)
    val cells = lm.keys.toSeq.groupBy { id =>
      (q(id)._1, lm(id) <= tb)
    }.view.mapValues { ids =>
      (ids.size.toLong, ids.map(id => q(id)._2).sum)
    }.toMap
    (tb, cells)
  }

  test("gate corpus: every cell cross-derives from lm_score × text_quality") {
    val (tb, cells) = expectedFrom(docs)
    val out = FilterAgreement.filterAgreementQ(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet == cells.keySet, s"cells ${out.keySet} != ${cells.keySet}")
    cells.foreach { case (k, (nd, st)) =>
      val (gn, gs, gtb) = out(k)
      assert(gn == nd && gs == st, s"cell $k: ($gn,$gs) != ($nd,$st)")
      assert(gtb == tb, s"threshold $gtb != $tb")
    }
    // the quartile cut actually cuts: roughly a quarter of docs are low_lm
    val lowFrac = out.collect { case ((_, true), (nd, _, _)) => nd }.sum.toDouble /
      out.values.map(_._1).sum
    assert(lowFrac >= 0.20 && lowFrac <= 0.60, s"low_lm fraction $lowFrac implausible")
  }

  test("planted: heuristic and LM disagree in both directions") {
    import spark.implicits._
    // attested fluent docs (high LM, high quality), a stopword-free list
    // doc (LOW quality but attested bigrams → high LM), and gibberish
    // repeats (low LM? no — repeated text is HIGH LM; its quality
    // repetition_ratio tanks) — plus hapax salad (low LM, decent quality)
    val fluent = (1 to 12).map(i =>
      (i.toLong, s"the cat and the dog are in the house with a friend $i"))
    val salad = (13 to 16).map(i =>
      (i.toLong, s"zebra$i quartz$i vortex$i nimbus$i osprey$i lagoon$i fjord$i"))
    val df = (fluent ++ salad).toDF("doc_id", "text")
    val out = FilterAgreement.filterAgreementQ(df).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == 16L, "every doc lands in exactly one cell")
    val keys = out.map(r => (r.getBoolean(0), r.getBoolean(1))).toSet
    // fluent docs: keep=true, high LM → (true, false); salad: hapax
    // bigrams → bottom quartile → low_lm=true
    assert(keys.contains((true, false)), "fluent cell missing")
    assert(keys.exists(_._2), "no doc in the LM tail")
  }
}
