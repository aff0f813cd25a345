package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VocabCoverage

class VocabCoverageSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("coverage curve matches an independent Scala recount") {
    // recount: token stream -> tf per term -> rank by (tf desc, term) ->
    // covered mass per K; the operator must reproduce every integer
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.select("text").collect().foreach { r =>
      val t = if (r.isNullAt(0)) null else r.getString(0)
      if (t != null)
        t.trim.toLowerCase.split("\\s+").foreach(w =>
          counts(w) = counts.getOrElse(w, 0L) + 1L)
    }
    val nullDocs = docs.filter("text IS NULL").count()
    assert(nullDocs == 0, "recount assumes no NULL text in the gate corpus")
    val total = counts.values.sum
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val got = VocabCoverage.vocabCoverage(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == VocabCoverage.CoverageKs.map(_.toLong))
    got.foreach { case (k, covered, nTerms, totalTf, cov) =>
      val expCovered = ranked.take(k.toInt).map(_._2).sum
      assert(covered == expCovered, s"K=$k covered $covered != $expCovered")
      assert(nTerms == counts.size && totalTf == total)
      val expCov = math.round(expCovered.toDouble / total * 1e6) / 1e6
      assert(math.abs(cov - expCov) < 1e-12, s"K=$k coverage $cov != $expCov")
    }
    // curve is monotone non-decreasing and ends at full mass on this
    // closed-pool corpus (n_terms < max K)
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    assert(got.last._2 == total, "closed pool must saturate at max K")
  }

  test("top-K plans as TakeOrderedAndProject, never a global sort") {
    val plan = VocabCoverage.vocabCoverage(docs).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must plan as TakeOrderedAndProject:\n$plan")
  }
}
