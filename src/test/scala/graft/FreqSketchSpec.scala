package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FreqSketch

/** freq_sketch — binomial accuracy of every reported df estimate against
  * the exact population df, merge-by-union over disjoint doc shards, and
  * a planted heavy hitter surfacing at rank 1. */
class FreqSketchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  private def exactDf = docs
    .select(col("source"),
      explode(expr("array_distinct(split(lower(trim(text)), '\\\\s+'))")).as("term"))
    .groupBy("source", "term").agg(count(lit(1)).as("df"))

  test("the exact top-K terms' sampled_df sits inside the binomial band") {
    // The band is pinned on the EXACT top-K per source — selection by
    // population df is independent of the sample, so each term's
    // sampled_df is an unconditional Binomial(df, p) draw. (Pinning the
    // band on the SKETCH's own top-K instead fails by design: ranking by
    // sampled count preferentially selects upward fluctuations into the
    // reported set — 6 of 200 gate terms beyond 3σ, all high — the
    // documented SpaceSaving-style near-boundary over-estimation, not
    // drift.) Multiplicity across ~200 terms: 4σ per-term hard wall,
    // 3σ violators capped at 1% + 1.
    val p = FreqSketch.SampleHexBound / 16.0
    val byDf = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("df").desc, col("term"))
    val topExact = exactDf
      .withColumn("r", row_number().over(byDf))
      .filter(col("r") <= FreqSketch.TopK)
    // full per-term sampled counts — NOT the sketch's top-K output, which
    // truncates below the reported boundary and would read as 0
    val sampled = docs
      .select(col("source"), col("text"),
        expr(FreqSketch.idHashExpr).as("fp"))
      .filter(expr(s"substring(fp, 1, 1) < '${FreqSketch.SampleHexBound}'"))
      .select(col("source"),
        explode(expr("array_distinct(split(lower(trim(text)), '\\\\s+'))")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("sampled_df"))
    val got = topExact.join(sampled, Seq("source", "term"), "left")
      .select(col("source"), col("term"),
        coalesce(col("sampled_df"), lit(0L)).as("sampled_df"), col("df"))
      .collect()
    assert(got.nonEmpty, "no exact top-K at gate SF")
    var over3 = 0
    got.foreach { r =>
      val s = r.getLong(2).toDouble
      val df = r.getLong(3).toDouble
      val sigma = math.sqrt(df * p * (1 - p))
      val dev = math.abs(s - p * df)
      if (dev > 3 * sigma + 1e-9) over3 += 1
      assert(dev <= 4 * sigma + 1e-9,
        s"${r.getString(0)}/${r.getString(1)}: sampled $s vs p·df ${p * df} " +
          f"(4σ = ${4 * sigma}%.2f) — deterministic hash, so this is a real drift")
    }
    assert(over3 <= got.length / 100 + 1,
      s"$over3 of ${got.length} terms beyond 3σ — more than multiplicity explains")
  }

  // Recall for a margin-separated heavy hitter is pinned by the planted
  // fixture below (the gate corpus has no 3σ-separated top-1 — its 31-term
  // vocabulary puts every common term's df within one band of the next).

  test("merge-by-union: disjoint shards' sampled counts add to the whole-corpus sketch") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    def counts(d: org.apache.spark.sql.DataFrame) = d
      .select(col("source"), col("text"),
        expr(FreqSketch.idHashExpr).as("fp"))
      .filter(expr(s"substring(fp, 1, 1) < '${FreqSketch.SampleHexBound}'"))
      .select(col("source"),
        explode(expr("array_distinct(split(lower(trim(text)), '\\\\s+'))")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
    val merged = counts(a).unionByName(counts(b))
      .groupBy("source", "term").agg(sum("c").as("sampled_df"))
    val whole = FreqSketch.freqSketch(docs)
      .select("source", "term", "sampled_df")
    val joined = whole.as("w").join(merged.as("m"), Seq("source", "term"))
      .filter(col("w.sampled_df") =!= col("m.sampled_df")).count()
    assert(joined == 0, "sharded counts diverge from the whole-corpus sample")
    assert(whole.join(merged, Seq("source", "term"), "left_anti").count() == 0,
      "a reported term is missing from the merged shards")
  }

  test("planted heavy hitter: a term in every sampled doc ranks first with a tight estimate") {
    // 64 docs all containing 'hot'; filler terms unique per doc. Sampling
    // is by doc fp, so 'hot' df_est = 2 × (#sampled docs) exactly.
    val fix = (0 until 64)
      .map(i => (i.toLong, s"hot filler$i extra$i", "en", "s0", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = FreqSketch.freqSketch(fix).orderBy("rank").collect()
    assert(rows.nonEmpty, "sample came up empty on 64 docs — bound drifted")
    val top = rows.head
    assert(top.getString(2) == "hot", s"heavy hitter not rank 1: ${top.getString(2)}")
    val nSampled = top.getLong(3)
    assert(top.getLong(4) == nSampled * (16 / FreqSketch.SampleHexBound))
    // every other reported term is a unique filler with sampled_df = 1
    rows.tail.foreach(r => assert(r.getLong(3) == 1L))
  }
}
