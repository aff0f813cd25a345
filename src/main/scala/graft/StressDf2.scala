package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch measurement (round-4 advice #5): the Σ df² dials at 10× the
  * gate corpus volume. Synthesizes — in /tmp, never committed — a 10×
  * `documents` table (each doc replicated 10× with a per-replica cyclic
  * word rotation, so replicas are genuine near-dups and vocabulary
  * density scales the way a growing corpus would), plus a SKEWED variant
  * with one ultra-hot shingle planted in every row (text + " the the
  * the" → bigram "the the" with df = |corpus|), then times
  * [[Dedup.ngramJaccardPairs]] under each dial:
  *
  *   - exact (no dials) — the Σ df² baseline at both volumes;
  *   - saltCandidates — lossless; should be ~neutral on the uniform
  *     corpus (no hot key to spread) and WIN on the skewed one, where the
  *     hot shingle's df² candidate rows otherwise land on one reducer;
  *   - maxDf — lossy; bounds the join at Σ min(df, cap)², dropping the
  *     hot shingle entirely.
  *
  * Single timed pass per config over a noop sink (these are 30-100 s
  * configs; Bench-style median-of-3 would triple a measurement run whose
  * output is a PERF.md table, not a gate). Corpus stats (Σ df², max df)
  * print alongside so the timings are interpretable.
  */
/** The three 10× stress corpora, shared with [[StressPrefix]]. Each
  * builder is deterministic in the base frame; callers materialize to
  * parquet before timing so generation cost stays out of the numbers. */
private[graft] object StressCorpora {
  def uniform10x(base: DataFrame): DataFrame = base
    .withColumn("r", explode(expr("sequence(0, 9)")))
    .withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
    .withColumn("rot", expr("concat(slice(w, r + 1, size(w) - r), slice(w, 1, r))"))
    .select((col("doc_id") * lit(10L) + col("r")).as("doc_id"),
      array_join(col("rot"), " ").as("text"),
      col("lang"), col("source"))
    .withColumn("n_chars", length(col("text")))

  def skewed10x(base: DataFrame): DataFrame = uniform10x(base)
    .withColumn("text", concat(col("text"), lit(" the the the")))
    .withColumn("n_chars", length(col("text")))

  def hotonly10x(base: DataFrame): DataFrame = base
    .withColumn("r", explode(expr("sequence(0, 9)")))
    .withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
    .withColumn("uid", col("doc_id") * lit(10L) + col("r"))
    .withColumn("uw", expr("transform(w, x -> concat(x, '_', CAST(uid AS STRING)))"))
    .select(col("uid").as("doc_id"),
      concat(array_join(col("uw"), " "), lit(" the the the")).as("text"),
      col("lang"), col("source"))
    .withColumn("n_chars", length(col("text")))
}

object StressDf2 {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_stress10x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, baseDir)

    // 10×: replica r rotates the word array left by r, so each replica
    // keeps the corpus vocabulary (df scales ×10 per shingle) while being
    // a near-dup of its siblings — what a 10×-grown dedup corpus looks like
    val uniform10x = StressCorpora.uniform10x(base)

    // skewed: one shingle ("the the") planted in EVERY row → df = |corpus|,
    // df² candidate rows all hashing to one reducer in the unsalted join
    val skewed10x = StressCorpora.skewed10x(base)

    // hot-only: every body shingle made doc-unique (df=1 → zero balanced
    // candidates) + the same planted hot shingle. The candidate join is
    // then ~ONLY the hot key's df² rows in one reducer task — isolates
    // "where the work lands" from "how much work there is"
    val hotonly10x = StressCorpora.hotonly10x(base)

    def materialize(df: DataFrame, name: String): DataFrame = {
      val path = s"$workDir/$name"
      df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val uni = materialize(uniform10x, "uniform10x")
    val skw = materialize(skewed10x, "skewed10x")
    val hot = materialize(hotonly10x, "hotonly10x")

    def stats(docs: DataFrame, name: String): Unit = {
      val df = Dedup.shingleSets(docs)
        .select(col("doc_id"), explode(col("shingles")).as("s"))
        .groupBy("s").agg(count(lit(1)).as("df"))
        .agg(count(lit(1)).as("shingles"), sum(expr("df * df")).as("sum_df2"),
          max("df").as("max_df"))
        .head()
      println(s"STATS corpus=$name docs=${docs.count()} " +
        s"distinct_shingles=${df.getLong(0)} sum_df2=${df.getLong(1)} max_df=${df.getLong(2)}")
    }

    // MIN of two passes: this box stalls for multi-second stretches
    // (PERF.md), and for CPU-bound work the min is the least-contaminated
    // estimate; both raw passes print so the noise is visible
    def time(name: String)(mk: => DataFrame): Unit = {
      val passes = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME config=$name sec=${passes.min}%.1f passes=${passes.map(p => f"$p%.1f").mkString("/")}")
      // drop the salted path's localCheckpoint residue between configs
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    // small warmup so config 1 doesn't pay JIT/codegen
    Dedup.ngramJaccardPairs(base).write.format("noop").mode("overwrite").save()

    stats(base, "base_1x")
    stats(uni, "uniform10x")
    stats(skw, "skewed10x")
    stats(hot, "hotonly10x")

    time("base1x_exact") { Dedup.ngramJaccardPairs(base) }
    time("uniform10x_exact") { Dedup.ngramJaccardPairs(uni) }
    time("uniform10x_salt32hot") { Dedup.ngramJaccardPairs(uni, saltCandidates = Some(32)) }
    time("skewed10x_exact") { Dedup.ngramJaccardPairs(skw) }
    time("skewed10x_salt32hot") { Dedup.ngramJaccardPairs(skw, saltCandidates = Some(32)) }
    time("skewed10x_maxdf1000") { Dedup.ngramJaccardPairs(skw, maxDf = Some(1000L)) }
    time("hotonly10x_exact") { Dedup.ngramJaccardPairs(hot) }
    time("hotonly10x_salt32hot") { Dedup.ngramJaccardPairs(hot, saltCandidates = Some(32)) }

    spark.stop()
  }
}
