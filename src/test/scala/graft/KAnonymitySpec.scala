package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KAnonymity

/** Class-size accounting by hand: a planted stratum with one large and
  * one singleton class; k boundary is strict (<); per-stratum rollup. */
class KAnonymitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def docs(rows: (String, String, Long)*) =
    rows.zipWithIndex.map { case ((lang, src, n), i) => (i.toLong, lang, src, n) }
      .toDF("doc_id", "lang", "source", "n_chars")

  test("singleton class flagged; k-sized class is safe (strict <)") {
    // stratum (en, a): 5 docs in bucket 64 (== K, safe), 1 doc in bucket 4096
    val d = docs(
      (Seq.fill(5)(("en", "a", 10L)) :+ ("en", "a", 9999L)) ++
        Seq(("de", "b", 100L), ("de", "b", 100L)): _*)
    val got = KAnonymity.kAnonymityAudit(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      ("en", "a", 2L, 1L, 1L, 1L),   // 2 classes, 1 small, 1 row at risk, min 1
      ("de", "b", 1L, 1L, 2L, 2L)),  // one 2-doc class, below k=5
      s"audit rows: $got")
  }

  test("bucket boundary: 63 vs 64 chars land in different classes") {
    val d = docs(("en", "a", 63L), ("en", "a", 64L))
    val got = KAnonymity.kAnonymityAudit(d).collect()(0)
    assert(got.getLong(2) == 2L, s"boundary not split: $got")
  }
}
