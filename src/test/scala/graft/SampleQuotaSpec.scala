package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SampleQuota

/** Exact-quota sampling: planted rank/admission arithmetic incl. the
  * shared-key duplicate tie, quota binding on the gate corpus, and
  * determinism under id-irrelevant re-keying.
  */
class SampleQuotaSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("planted: rank cut admits exactly the quota; duplicates tie-break by id") {
    import spark.implicits._
    // one stratum 'xx' (default quota 60 never binds at n=4) and a tiny
    // quota check via direct rank assertions
    val df = Seq(
      (1L, "xx", "same text"), (2L, "xx", "same text"),   // shared sample_key
      (3L, "xx", "other a"), (4L, "xx", "other b"))
      .toDF("doc_id", "lang", "text")
    val out = SampleQuota.sampleQuotaQ(df).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getBoolean(5))))
      .toMap
    // duplicates share the key and rank adjacently, doc 1 before doc 2
    assert(out(1L)._1 == out(2L)._1)
    assert(out(2L)._2 == out(1L)._2 + 1)
    assert(out.values.map(_._2).toSeq.sorted == Seq(1L, 2L, 3L, 4L))
    assert(out.values.forall(_._3), "n=4 < default quota 60 admits all")
  }

  test("gate corpus: admitted counts = min(quota, stratum size)") {
    val byLang = docs.select("lang").collect().map(_.getString(0))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val admitted = SampleQuota.sampleQuotaQ(docs).collect()
      .filter(_.getBoolean(5))
      .groupBy(_.getString(1)).map { case (k, v) => k -> v.length.toLong }
    byLang.foreach { case (lang, n) =>
      val quota = SampleQuota.Quotas.getOrElse(lang, SampleQuota.DefaultQuota)
      assert(admitted.getOrElse(lang, 0L) == math.min(quota, n),
        s"lang $lang: n=$n quota=$quota got ${admitted.getOrElse(lang, 0L)}")
    }
  }

  test("selection is content-keyed: id shifts don't change the chosen texts") {
    import org.apache.spark.sql.functions._
    val shifted = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    def chosen(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
      SampleQuota.sampleQuota(df).filter(col("admitted"))
        .select("lang", "sample_key").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    assert(chosen(docs) == chosen(shifted))
  }

  test("plan: one lang exchange for the rank window") {
    val plan = SampleQuota.sampleQuota(docs)
      .queryExecution.executedPlan.toString
    val ex = plan.linesIterator
      .map(_.dropWhile(c => !c.isLetter && !c.isDigit))
      .count(_.startsWith("Exchange"))
    assert(ex == 1, s"expected 1 exchange, got $ex:\n$plan")
  }
}
