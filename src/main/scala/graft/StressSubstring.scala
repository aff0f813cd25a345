package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SubstringDedup

/** Scratch measurement (r12 verdict item 8): the substring family's
  * HOT-GRAM regime — the one where the semi-join-vs-window verdict
  * choice is supposed to pay. Corpus: the rotation-replica 10× build
  * with the SAME 15-token boilerplate header pasted onto every doc, so
  * 8 stride-1 grams reach df = 10·|base| (50k at sf0.1 — a planted
  * stop-phrase/license-header shape) while everything else stays the
  * gate distribution. Times (min-of-2, noop sink):
  *
  *  - the shipped semi-join verdict, exact;
  *  - the private count-window twin, exact (row-count cross-checked);
  *  - the semi verdict at maxDf=1000 — the lossy dial that drops the
  *    boilerplate grams from the duplicate-key set outright.
  *
  * Output feeds the PERF.md table, not a gate. Honest framing: a df=50k
  * key is far below one reducer's capacity, so one box can bound the
  * two forms' CONSTANT gap but not reproduce the 100 TB failure mode
  * (df ≫ per-reducer volume pinning one un-splittable WindowExec task);
  * the number this run adds is the hot-regime cost of each form at the
  * largest locally honest skew, plus what the dial buys back. */
object StressSubstring {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_stress_substr"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, baseDir)
    val boiler = (1 to 15).map(i => s"bp$i").mkString(" ")
    val boiler10x = StressCorpora.uniform10x(base)
      .withColumn("text", concat(lit(boiler + " "), col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))

    def materialize(df: DataFrame, name: String): DataFrame = {
      val path = s"$workDir/$name"
      df.repartition(32).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val hot = materialize(boiler10x, "boiler10x")
    // the dial's own regime: boilerplate CARRIES the position volume —
    // every doc is one 200-token shared body + a unique 10-token tail,
    // so ~95% of all gram positions are df=10·|base| hot
    val body = (1 to 200).map(i => s"bd$i").mkString(" ")
    val allhot10x = StressCorpora.uniform10x(base)
      .select(col("doc_id"),
        concat(lit(body + " "),
          expr("concat_ws(' ', transform(sequence(1, 10), " +
            "i -> concat('u', CAST(doc_id AS STRING), '_', CAST(i AS STRING))))"))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val allHot = materialize(allhot10x, "allhot10x")
    val maxDfGram = SubstringDedup.gramStream(hot)
      .groupBy("gh").count().agg(max("count")).collect()(0).getLong(0)
    println(s"STATS base=${base.count()} hot10x=${hot.count()} max_gram_df=$maxDfGram")

    def time(name: String)(mk: => DataFrame): Double = {
      val passes = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME config=$name sec=${passes.min}%.1f passes=${passes.map(p => f"$p%.1f").mkString("/")}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      passes.min
    }

    SubstringDedup.substringDedup(base).write.format("noop").mode("overwrite").save() // warmup

    for ((tag, docs) <- Seq("1x" -> base, "hot10x" -> hot, "allhot10x" -> allHot)) {
      time(s"semi_$tag") { SubstringDedup.substringDedup(docs) }
      time(s"window_$tag") { SubstringDedup.substringDedupViaWindow(docs) }
      time(s"semi_maxdf1000_$tag") { SubstringDedup.substringDedup(docs, maxDf = Some(1000L)) }
    }
    // exactness cross-check on the hot corpus: the two exact forms agree,
    // the dialed form drops the boilerplate-covered positions
    val nSemi = SubstringDedup.substringDedup(hot).count()
    val nWin = SubstringDedup.substringDedupViaWindow(hot).count()
    val nCap = SubstringDedup.substringDedup(hot, maxDf = Some(1000L)).count()
    println(s"ROWS semi=$nSemi window=$nWin capped=$nCap")
    require(nSemi == nWin, s"exact twins diverged: $nSemi vs $nWin")
    spark.stop()
  }
}
