package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, PrefixJoin}

/** Scratch measurement: the prefix filter's regime. At gate scale
  * (rare-bigram corpus) `dedup_prefix` LOSES to the plain inverted index
  * — the df aggregation + rank window are pure overhead when Σ df² is
  * already small. Its claim is the dense/skewed regime, where frequent
  * shingles dominate Σ df²: the global rarity ordering pushes exactly
  * those shingles out of every prefix. This main times both forms —
  * and counts both candidate sets — on the [[StressCorpora]] trio, so
  * PERF.md can state the crossover honestly. Output feeds a table, not a
  * gate; min-of-2 passes per the StressDf2 convention.
  */
object StressPrefix {
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
    def materialize(df: DataFrame, name: String): DataFrame = {
      val path = s"$workDir/$name"
      if (!new java.io.File(path, "_SUCCESS").exists())
        df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val uni = materialize(StressCorpora.uniform10x(base), "uniform10x")
    val skw = materialize(StressCorpora.skewed10x(base), "skewed10x")
    val hot = materialize(StressCorpora.hotonly10x(base), "hotonly10x")

    def fullCandidates(docs: DataFrame): Long = {
      val ex = Dedup.shingleSets(docs)
        .select(col("doc_id"), explode(col("shingles")).as("s"))
        .select(col("doc_id"), expr("xxhash64(s)").as("sh"))
      ex.select(col("doc_id").as("id1"), col("sh"))
        .join(ex.select(col("doc_id").as("id2"), col("sh")), Seq("sh"))
        .filter(col("id1") < col("id2")).select("id1", "id2").distinct().count()
    }

    def time(name: String)(mk: => DataFrame): Unit = {
      val passes = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME config=$name sec=${passes.min}%.1f passes=${passes.map(p => f"$p%.1f").mkString("/")}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    Dedup.ngramJaccardPairs(base).write.format("noop").mode("overwrite").save() // warmup

    Seq(("base_1x", base), ("uniform10x", uni), ("skewed10x", skw),
      ("hotonly10x", hot)).foreach { case (name, docs) =>
      println(s"CAND corpus=$name full=${fullCandidates(docs)} " +
        s"prefix=${PrefixJoin.candidates(docs).count()}")
      time(s"${name}_exact") { Dedup.ngramJaccardPairs(docs) }
      time(s"${name}_prefix") { PrefixJoin.prefixJaccardPairs(docs) }
      time(s"${name}_hybrid") { PrefixJoin.hybridJaccardPairs(docs) }
      // round-14 A/B: join-back df (production, skew-invariant-consistent)
      // vs the demoted window-df twin — bounds the join-back's overhead
      // at every regime incl. planted hot shingles; the window's 100 TB
      // failure (one un-splittable hot partition) is structural and not
      // reachable on one box
      time(s"${name}_hybrid_windowdf") { PrefixJoin.hybridJaccardPairsWindowDf(docs) }
    }
    spark.stop()
  }
}
