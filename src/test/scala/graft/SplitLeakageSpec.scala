package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SplitLeakage, TextOps}

/** Cross-split leakage audit: output cross-derived from the pair miner ×
  * the split assignment, exact-dup straddle impossibility, and a planted
  * near-dup pair proven (by Scala md5 replication of the split rule) to
  * straddle train/test.
  */
class SplitLeakageSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def splitOf(text: String): String = {
    val fp = md5hex(text.trim.toLowerCase.replaceAll("\\s+", " "))
    val bucket = md5hex(s"graft-split:$fp").substring(0, 4)
    if (bucket < "cccc") "train" else if (bucket < "e666") "val" else "test"
  }

  test("output = near-dup pair set restricted to straddling pairs, labels exact") {
    val pairSet = Dedup.ngramJaccardPairs(docs).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val splits = TextOps.corpusSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairSet.filter { case (a, b) => splits(a) != splits(b) }
    val out = SplitLeakage.splitLeakageQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getString(1), r.getString(3)))
      .toMap
    assert(out.keySet == expected,
      s"leak pairs ${out.keySet} != pair-set × split cross-derivation $expected")
    out.foreach { case ((a, b), (sa, sb)) =>
      assert(sa == splits(a) && sb == splits(b), s"pair ($a,$b) labels")
      assert(sa != sb, s"pair ($a,$b) does not straddle")
    }
  }

  test("exact-dup safety: equal fingerprints always land in one split") {
    val perFp = TextOps.corpusSplit(docs)
      .groupBy("fingerprint").agg(countDistinct("split").as("nsplits"))
      .agg(max("nsplits")).head().getLong(0)
    assert(perFp == 1L, "a fingerprint straddles splits")
  }

  test("planted near-dup pair straddling train/test is reported") {
    // deterministic search: vary the final word until the two one-word-apart
    // variants (bigram Jaccard ≥ .8 at this length) land in different splits
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val tail = (1 to 999).view.map(i => (s"$base alpha$i", s"$base beta$i"))
      .find { case (a, b) => splitOf(a) != splitOf(b) }
    assert(tail.nonEmpty, "no straddling variant in 999 candidates")
    val (ta, tb) = tail.get
    import spark.implicits._
    val planted = Seq((1L, ta), (2L, tb), (3L, "totally unrelated text here"))
      .toDF("doc_id", "text")
    val out = SplitLeakage.splitLeakageQ(planted).collect()
    assert(out.length == 1, s"expected exactly the planted pair, got ${out.length}")
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(2) == 2L)
    assert(r.getString(1) == splitOf(ta) && r.getString(3) == splitOf(tb))
    assert(r.getDouble(7) >= Dedup.JaccardThreshold)
  }
}
