package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UrlCanon

/** Canonical-URL resolution over the committed variant-planting fixture:
  * every canonicalization rule is pinned by a hand-computed group.
  */
class UrlCanonSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fixture: canonical groups, reference mass, and rule coverage") {
    val rows = UrlCanon.urlCanonicalizeQ(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // host case + trailing slash + utm-only + utm-pair + fragment all fold
    // into one resource: 5 refs across docs 1,2,3 under 5 raw spellings
    assert(rows("https://example.com/path") == (5L, 3L, 5L, 1L))
    // scheme is canonical-significant; doc 4's slash variant folds in
    assert(rows("http://example.com/path") == (2L, 1L, 2L, 4L))
    // utm-leading-with-survivor (doc 2) and utm-trailing (doc 7) agree
    assert(rows("https://example.com/search?q=spark") == (2L, 2L, 2L, 2L))
    // param order is NOT canonicalized away
    assert(rows.contains("https://example.com/search?page=2&q=spark"))
    assert(rows("https://example.com/other") == (1L, 1L, 1L, 3L))
    assert(rows.size == 5, s"unexpected canonical set: ${rows.keys.toSeq.sorted}")
  }

  test("canonicalization is idempotent on already-canonical forms") {
    import spark.implicits._
    val canon = UrlCanon.urlCanonicalizeQ(spark).collect().map(_.getString(0))
    val redo = UrlCanon.urlCanonicalize(
      canon.zipWithIndex.map { case (u, i) => (i.toLong, s"see $u here") }
        .toSeq.toDF("doc_id", "text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(redo.map(_._1).sorted.toSeq == canon.sorted.toSeq)
    assert(redo.forall { case (_, nRefs, nVar) => nRefs == 1L && nVar == 1L })
  }
}
