package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Unregistered measurement tool (StressDf2 family): stratum-skew stress
  * for quality_select. The round-6 form windows over
  * `Window.partitionBy(lang)` — with one dominant language the whole
  * stratum's sort lands on ONE reducer, which is the round-6 verdict's
  * "What's wrong #1". The round-7 two-pass form (histogram + broadcast
  * join + tie-bucket window) should be flat in stratum skew: its only
  * doc-row exchange hashes on (lang, rounded-score) tie buckets.
  *
  * Corpus: ~95% of docs in one language, at ~100× the sf0.1 gate corpus's
  * document count, text drawn from the same synthetic family as
  * StressLongDocs so the rounded score populates many tie buckets.
  */
object StressStratum {

  def synth(spark: SparkSession, nDocs: Long): DataFrame =
    spark.range(nDocs).toDF("doc_id")
      // variable length 20-40 words so the quality sub-scores spread
      .withColumn("text", expr(
        "concat_ws(' ', transform(sequence(1, 20 + CAST(pmod(hash(doc_id), 21) AS INT)), i -> concat('w', pmod(hash(doc_id, i), 1000))))"))
      .withColumn("lang",
        expr("CASE WHEN doc_id % 20 = 0 THEN 'de' WHEN doc_id % 40 = 1 THEN 'fr' ELSE 'en' END"))
      .withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32, col("doc_id"))
      .localCheckpoint()

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 500000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Double = {
      f // warmup
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"STRESS $name%-40s ${ts.min}%8.3f s")
      ts.min
    }

    val docs = synth(spark, nDocs)
    val langs = docs.groupBy("lang").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    println(s"corpus: $nDocs docs, strata: $langs")

    // sanity: both forms still agree at this scale before timing
    val a = Curation.qualitySelect(docs).filter(col("selected")).count()
    val b = Curation.qualitySelectWindow(docs).filter(col("selected")).count()
    require(a == b, s"selected counts diverge: two-pass $a vs window $b")
    println(s"CHECK selected counts equal: $a")

    time("quality_select window (1-reducer stratum)") {
      Curation.qualitySelectWindow(docs)
        .agg(sum(when(col("selected"), 1L).otherwise(0L))).collect()
    }
    time("quality_select two-pass (tie buckets)") {
      Curation.qualitySelect(docs)
        .agg(sum(when(col("selected"), 1L).otherwise(0L))).collect()
    }

    // the same corpus is also the GIANT-SOURCE case for token_budget_pack
    // (every doc shares one source): window form = one reducer sorts and
    // prefix-sums the whole corpus; range form spreads it
    val pa = Curation.tokenBudgetPack(docs).filter(col("packed")).count()
    val pb = Curation.tokenBudgetPackRange(docs).filter(col("packed")).count()
    require(pa == pb, s"packed counts diverge: window $pa vs range $pb")
    println(s"CHECK packed counts equal: $pa")
    time("token_budget_pack window (1-reducer source)") {
      Curation.tokenBudgetPack(docs)
        .agg(sum(when(col("packed"), 1L).otherwise(0L))).collect()
    }
    time("token_budget_pack range-partitioned") {
      Curation.tokenBudgetPackRange(docs)
        .agg(sum(when(col("packed"), 1L).otherwise(0L))).collect()
    }
    spark.stop()
  }
}
