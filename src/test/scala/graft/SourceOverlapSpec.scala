package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SourceOverlap

/** Cross-source overlap matrix: exact Jaccard recomputation on a planted
  * fixture, full-matrix totality (zero-intersection pairs present), and
  * the joined-not-nested plan shape for the shingle self-join.
  */
class SourceOverlapSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted fixture: exact shingle Jaccard per pair, zero pairs kept") {
    import spark.implicits._
    // sA/sB share 'a b' and 'b c'; sC is disjoint; sD duplicates sA exactly
    val docs = Seq(
      (1L, "a b c", "sA"), (2L, "x y", "sA"),     // sA: {a b, b c, x y}
      (3L, "a b c d", "sB"),                      // sB: {a b, b c, c d}
      (4L, "p q r", "sC"),                        // sC: {p q, q r}
      (5L, "a b c", "sD"), (6L, "x y", "sD"))     // sD = sA
      .toDF("doc_id", "text", "source")
    val got = SourceOverlap.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.size == 6, "full 4-choose-2 matrix")
    assert(got(("sA", "sB")) == ((3L, 3L, 2L, 0.5)))       // 2 / (3+3-2)
    assert(got(("sA", "sC"))._3 == 0L && got(("sA", "sC"))._4 == 0.0)
    assert(got(("sA", "sD")) == ((3L, 3L, 3L, 1.0)), "mirror sources score 1")
    assert(got(("sB", "sC"))._3 == 0L)
  }

  test("sf0.001 corpus: symmetric-free full matrix, bounds, self-consistency") {
    val docs = Tables.documents(spark, sf)
    val sources = docs.select("source").distinct().count()
    val rows = SourceOverlap.sourceOverlapQ(docs).collect()
    assert(rows.length == sources * (sources - 1) / 2)
    rows.foreach { r =>
      val (a, b, na, nb, inter, j) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b, "upper triangle only")
      assert(inter >= 0 && inter <= math.min(na, nb))
      assert(j >= 0.0 && j <= 1.0)
      // shared synthetic vocabulary ⇒ sources genuinely overlap
      assert(na > 0 && nb > 0)
    }
    assert(rows.exists(_.getLong(4) > 0), "corpus sources share bigrams")
  }

  test("plan: shingle self-join is a hash/merge join, not a nested loop") {
    val docs = Tables.documents(spark, sf)
    val plan = SourceOverlap.sourceOverlap(docs).queryExecution.executedPlan.toString
    // the only nested loop allowed is the catalog-sized pair enumeration
    val nlj = plan.linesIterator.count(l =>
      l.contains("BroadcastNestedLoopJoin") || l.contains("CartesianProduct"))
    assert(nlj <= 1, s"unexpected nested loops:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "shingle join must be keyed")
  }
}
