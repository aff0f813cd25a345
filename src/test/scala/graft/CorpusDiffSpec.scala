package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusDiff

/** Corpus version diff: status classification, normalization contract
  * (cosmetic rewrites are NOT changes), per-doc fate recomputation over
  * the synthetic snapshot derivation, and join-shape sanity.
  */
class CorpusDiffSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("diff classifies added/removed/changed/unchanged; cosmetic rewrites are unchanged") {
    import spark.implicits._
    val old = Seq(
      (1L, "gone doc", "s0"),
      (2L, "Same   Doc", "s0"),
      (3L, "will change", "s1"),
      (5L, "spaced  out", "s1")).toDF("doc_id", "text", "source")
    val nw = Seq(
      (2L, "same doc", "s0"),     // case+whitespace only — NOT a change
      (3L, "has changed", "s1"),
      (4L, "brand new", "s2"),
      (5L, "SPACED OUT", "s1")).toDF("doc_id", "text", "source")
    val got = CorpusDiff.corpusDiff(old, nw).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added", 5L -> "unchanged"))
  }

  test("synthetic snapshots: every doc's status matches its ver_key fate") {
    val docs = Tables.documents(spark, sf)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = CorpusDiff.corpusDiffQ(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == ids, "diff must cover exactly the id universe")
    ids.foreach { id =>
      val expected = md5hex(s"graft-ver:$id").charAt(0) match {
        case '0' | '1' => "added"
        case 'e' | 'f' => "removed"
        case '2' | '3' => "changed"
        case _         => "unchanged"
      }
      assert(got(id) == expected, s"doc $id")
    }
    // the fixture hash spreads: all four statuses occur at sf0.001
    assert(got.values.toSet == Set("added", "removed", "changed", "unchanged"))
  }

  test("plan: doc_id-keyed full outer join, no cartesian, text never crosses the join") {
    val docs = Tables.documents(spark, sf)
    val plan = CorpusDiff.corpusDiffQ(docs).queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    // fingerprints are computed below the join: no exchange row carries `text`
    val exch = plan.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exch.contains("text"), s"join input must carry fingerprints, not text:\n$exch")
  }
}
