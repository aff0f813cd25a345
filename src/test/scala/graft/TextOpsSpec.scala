package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("corpus_split: fingerprint-keyed (no leakage), ~80/10/10, map-only plan") {
    val rows = TextOps.corpusSplit(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // leakage safety: every doc sharing a fingerprint shares a split. The
    // sf0.001 corpus has no byte-identical docs (500 distinct
    // fingerprints), so PLANT exact dups: re-id every doc, including
    // whitespace-variant copies (same normalized fingerprint by design)
    val planted = docs.select(col("doc_id") + 10000, concat(col("text"), lit("  ")),
        col("lang"), col("source"), col("n_chars"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val withDups = TextOps.corpusSplit(docs.unionByName(planted)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byFp = withDups.groupBy(_._2)
    assert(byFp.forall(_._2.length == 2), "each fingerprint should appear exactly twice")
    byFp.foreach { case (fp, ds) =>
      assert(ds.map(_._3).distinct.length == 1, s"fingerprint $fp straddles splits")
    }
    // proportions: binomial at n=500 → generous bands around 0.8/0.1/0.1
    val n = rows.length.toDouble
    val frac = rows.groupBy(_._3).view.mapValues(_.length / n).toMap
    assert(frac.getOrElse("train", 0.0) > 0.7 && frac.getOrElse("train", 0.0) < 0.9, s"$frac")
    assert(frac.getOrElse("val", 0.0) > 0.03 && frac.getOrElse("val", 0.0) < 0.2, s"$frac")
    assert(frac.getOrElse("test", 0.0) > 0.03 && frac.getOrElse("test", 0.0) < 0.2, s"$frac")
    // determinism + plan shape: pure map pass, zero exchanges of any kind
    val again = TextOps.corpusSplit(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(again.sortBy(_._1).sameElements(rows.sortBy(_._1)))
    val plan = TextOps.corpusSplit(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"corpus_split should be map-only:\n$plan")
  }

  test("text_stats ratios are in [0,1] and n_chars matches length") {
    val rows = TextOps.textStats(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chars") == r.getAs[Int]("n_chars_calc"))
      Seq("punct_ratio", "digit_ratio", "upper_ratio").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
      }
      assert(r.getAs[Double]("avg_word_len") > 0.0)
    }
  }

  test("text_quality score is bounded and keep follows the threshold") {
    val rows = TextOps.textQuality(docs).collect()
    rows.foreach { r =>
      val s = r.getAs[Double]("quality_score")
      assert(s >= 0.0 && s <= 1.0)
      assert(r.getAs[Boolean]("keep") == (s >= 0.5))
    }
  }

  test("lang_id predicts only known langs or unknown, deterministic") {
    val preds = TextOps.langId(docs).select("pred_lang").distinct()
      .collect().map(_.getString(0)).toSet
    val allowed = TextOps.LangMarkers.map(_._1).toSet + "unknown"
    assert(preds.subsetOf(allowed), s"unexpected predictions: $preds")
  }

  test("token_count: bpe tokens >= ws tokens (punct split off)") {
    val bad = TextOps.tokenCount(docs)
      .filter(col("bpe_tokens") < col("ws_tokens")).count()
    assert(bad == 0)
  }

  test("dedup_exact: canonical ids are fixpoints and dups point backwards") {
    import spark.implicits._
    // seed with real duplicates: identical text under different ids
    val d = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "Alpha  Beta   GAMMA"), // same after normalization
      (4L, "something else")).toDF("doc_id", "text")
    val out = TextOps.dedupExact(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L && out(4L) == 4L)
  }
}
