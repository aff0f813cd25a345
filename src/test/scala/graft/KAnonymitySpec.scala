package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KAnonymity, LDiversity, TCloseness}

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

  private def tdocs(rows: (String, String, String)*) =
    rows.zipWithIndex.map { case ((text, lang, src), i) =>
      (i.toLong, text, lang, src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("l-diversity: homogeneous class flagged with exact exposure; diverse class safe") {
    // stratum (en, s1): ONE bucket-64 class of 3 docs, all topic
    // 'execution' → n_topics=1 < l=2: flagged, 3 rows exposed, min 1.
    // stratum (en, s2): one class of 2 docs with topics execution AND
    // storage → diverse: 0 flagged, min 2.
    val d = tdocs(
      ("join hash merge", "en", "s1"),
      ("join hash sort", "en", "s1"),
      ("hash merge agg", "en", "s1"),
      ("join hash filter", "en", "s2"),
      ("scan table column", "en", "s2"))
    val got = LDiversity.lDiversityAudit(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == Set(
      ("en", "s1", 1L, 1L, 3L, 1L),
      ("en", "s2", 1L, 0L, 0L, 2L)),
      s"audit rows: $got")
  }

  test("t-closeness: skewed-but-diverse class flagged; trio independence by hand") {
    // stratum (en, skew): ONE class of 5 docs — 3 'execution', 2
    // 'streaming'. k-SAFE (size 5, strict <5), l-SAFE (2 topics), yet
    // its distribution skews far from global. stratum (en, base): 20
    // 'storage' docs — k-safe, l-FLAGGED (homogeneous), t-SAFE (it IS
    // most of the global mass).
    // Global: exec 3, storage 20, streaming 2, unknown 0; tot 25 →
    // q_ppm (exec, storage, streaming, unknown) = (120000, 800000,
    // 80000, 0).
    // skew p_ppm = (600000, 0, 400000, 0); diff = (+480000, −800000,
    // +320000, 0); cum = (480000, −320000, 0, 0); Σ|cum| = 800000 →
    // emd = 800000 div 3 = 266666 > 200000 → FLAGGED, 5 rows exposed.
    // base p_ppm = (0, 1000000, 0, 0); diff = (−120000, +200000,
    // −80000, 0); cum = (−120000, 80000, 0, 0); Σ|cum| = 200000 →
    // emd = 66666 ≤ 200000 → safe.
    val d = tdocs(
      (Seq.fill(3)(("join hash", "en", "skew")) ++
        Seq.fill(2)(("stream window", "en", "skew")) ++
        Seq.fill(20)(("scan table", "en", "base"))): _*)
    val t = TCloseness.tClosenessAudit(d).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    assert(t("skew") == ((1L, 1L, 5L, 266666L)), s"skew stratum: ${t("skew")}")
    assert(t("base") == ((1L, 0L, 0L, 66666L)), s"base stratum: ${t("base")}")
    // trio independence: skew is k-safe AND l-safe yet t-flagged;
    // base is l-flagged yet t-safe.
    val k = KAnonymity.kAnonymityAudit(d).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    val l = LDiversity.lDiversityAudit(d).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(k("skew") == 0L && l("skew") == 0L, s"skew k/l: ${k("skew")}/${l("skew")}")
    assert(l("base") == 1L && t("base")._2 == 0L, s"base l/t: ${l("base")}/${t("base")}")
  }

  test("t-closeness: a class that IS the whole corpus has EMD exactly 0") {
    // One class == global ⇒ p_ppm == q_ppm per topic (same counts, same
    // truncating div) ⇒ every cumulative term 0 ⇒ emd_ppm = 0.
    val d = tdocs(
      ("join hash", "en", "s"), ("scan table", "en", "s"),
      ("stream window", "en", "s"))
    val got = TCloseness.tClosenessAudit(d).collect()(0)
    assert(got.getLong(3) == 0L && got.getLong(5) == 0L, s"identity class: $got")
  }

  test("k and l are independent: a k-safe class can be l-exposed and vice versa") {
    // (en, big): 6 same-topic docs in one class — k-safe at K=5, but
    // l-flagged (homogeneous). (en, tiny): 2 docs, 2 topics — k-flagged
    // (below 5), l-diverse.
    val d = tdocs(
      (Seq.fill(6)(("join hash merge", "en", "big")) ++
        Seq(("join hash sort", "en", "tiny"), ("scan table row", "en", "tiny"))): _*)
    val k = KAnonymity.kAnonymityAudit(d).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    val l = LDiversity.lDiversityAudit(d).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(k("big") == 0L && l("big") == 1L, s"big: k=${k("big")} l=${l("big")}")
    assert(k("tiny") == 1L && l("tiny") == 0L, s"tiny: k=${k("tiny")} l=${l("tiny")}")
  }
}
