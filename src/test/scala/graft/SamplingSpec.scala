package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sampling}

/** Deterministic stratified sampling + quality-aware cluster canonicals:
  * exact per-doc recomputation of the hash-threshold decision, rate
  * plausibility, content-stability, and the keep-best invariants.
  */
class SamplingSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("corpus_sample: per-doc decision recomputes exactly; rates stratify by lang") {
    val texts = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val out = Sampling.corpusSample(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    assert(out.size == texts.length)
    texts.foreach { case (id, lang, text) =>
      val fp = md5hex(Option(text).getOrElse("").trim.toLowerCase
        .replaceAll("\\s+", " "))
      val key8 = md5hex(s"graft-sample:$fp").take(8)
      val rate = Sampling.SampleRates.getOrElse(lang, Sampling.DefaultRate)
      val expected = key8 < Sampling.thresholdHex(rate)
      val (gLang, gKey, gRate, gSampled) = out(id)
      assert(gLang == lang && gKey == key8, s"doc $id key mismatch")
      assert(gRate == rate, s"doc $id rate")
      assert(gSampled == expected, s"doc $id sampled")
    }
    // rate-1.0 strata keep everything; the en stratum is genuinely cut
    val byLang = out.values.groupBy(_._1)
    byLang.foreach { case (lang, rs) =>
      val kept = rs.count(_._4).toDouble / rs.size
      if (!Sampling.SampleRates.contains(lang))
        assert(kept == 1.0, s"$lang: unlisted stratum must keep all")
    }
    val en = byLang("en")
    val enKept = en.count(_._4).toDouble / en.size
    assert(enKept > 0.25 && enKept < 0.75, s"en realized rate $enKept far from 0.5")
  }

  test("corpus_sample: content-keyed — re-ingest with shifted ids samples identically") {
    val shifted = docs.withColumn("doc_id", col("doc_id") + 100000L)
    val orig = Sampling.corpusSample(docs).select("sample_key", "sampled")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val re = Sampling.corpusSample(shifted).select("sample_key", "sampled")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(orig == re, "same content must sample the same regardless of ids")
    // and the plan is a pure map pass up to the output sort
    val p = Sampling.corpusSampleQ(docs).queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"corpus_sample must not shuffle before the output sort:\n$p")
  }

  test("dedup_cluster_keep_best: canonical is the max-quality member, clusters match dedup_cluster") {
    val out = Dedup.dedupClusterKeepBest(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getDouble(4)))
    val clusters = Dedup.dedupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(o => o._1 -> o._2).toMap == clusters,
      "keep_best must carry dedup_cluster's labels unchanged")
    val qs4 = out.map(o => o._1 -> math.round(o._5 * 10000.0)).toMap
    out.groupBy(_._2).foreach { case (cid, members) =>
      val best = members.filter(_._4)
      assert(best.length == 1, s"cluster $cid: exactly one kept member")
      val b = best.head
      assert(b._3 == b._1, s"cluster $cid: best_id must be the kept member's id")
      members.foreach { m =>
        assert(m._3 == b._1, s"cluster $cid: best_id constant across members")
        val cmp = (qs4(b._1) > qs4(m._1)) ||
          (qs4(b._1) == qs4(m._1) && b._1 <= m._1)
        assert(cmp, s"cluster $cid: kept ${b._1} not max-quality vs ${m._1}")
      }
    }
    // the corpus's near-dup clusters genuinely differ in quality, so at
    // least one cluster keeps a NON-min-id member — the whole point of
    // the variant vs dedup_cluster's min-id canonical
    val divergent = out.filter(o => o._4 && o._1 != o._2)
    assert(divergent.nonEmpty,
      "expected at least one cluster whose best copy is not the min-id member")
  }
}
