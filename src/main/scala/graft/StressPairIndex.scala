package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Parity, SourceDupRate, SplitLeakage, ThresholdSweep}

/** Scratch measurement for the round-12 persisted pair-index economics
  * (VERDICT r11 item 4): six registered queries each re-mine the same
  * τ=0 exact pair stream (Σ df² inverted-index join). This main times,
  * at the given SF dir (gate sf0.1 is the PERF.md row):
  *   (a) the six INLINE registered queries, each paying the mine;
  *   (b) mining ONCE — pairIndex build + bucketed persist — then the six
  *       FROM-INDEX forms reading the stored stats.
  * Row-identity of every from-index form is pinned in InfraSpec; this
  * reports the amortized wall so PERF.md can state the trade with
  * numbers. Not a gate. */
object StressPairIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_pairidx_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }

    val inline: Seq[(String, () => DataFrame)] = Seq(
      ("dedup_ngram_jaccard", () => SparkEntry.queries("dedup_ngram_jaccard")(spark, sfDir)),
      ("dedup_cluster", () => SparkEntry.queries("dedup_cluster")(spark, sfDir)),
      ("dedup_cluster_keep_best", () => SparkEntry.queries("dedup_cluster_keep_best")(spark, sfDir)),
      ("dedup_threshold_sweep", () => SparkEntry.queries("dedup_threshold_sweep")(spark, sfDir)),
      ("split_leakage", () => SparkEntry.queries("split_leakage")(spark, sfDir)),
      ("source_dup_rate", () => SparkEntry.queries("source_dup_rate")(spark, sfDir)))

    var inlineTotal = 0.0
    inline.foreach { case (name, q) =>
      val (t, n) = time(q().count())
      inlineTotal += t
      println(f"PAIRIDX inline $name%-24s ${t}%7.2f s  rows=$n")
    }

    spark.sql("DROP TABLE IF EXISTS graft_pair_idx")
    val (tBuild, _) = time {
      Dedup.pairIndex(docs)
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "id1").sortBy("id1", "id2")
        .saveAsTable("graft_pair_idx")
    }
    val idx = spark.table("graft_pair_idx")

    val fromIndex: Seq[(String, () => DataFrame)] = Seq(
      ("dedup_ngram_jaccard", () => Dedup.pairsFromIndex(idx)
        .select(col("id1"), col("id2"), col("n1"), col("n2"), col("inter"),
          Parity.r("jaccard", 4)).orderBy("id1", "id2")),
      ("dedup_cluster", () => Dedup.dedupClustersFromIndex(docs, idx).orderBy("doc_id")),
      ("dedup_cluster_keep_best",
        () => Dedup.dedupClusterKeepBestFromIndex(docs, idx).orderBy("doc_id")),
      ("dedup_threshold_sweep",
        () => ThresholdSweep.dedupThresholdSweepFromIndex(idx).orderBy("tau_pct")),
      ("split_leakage", () => SplitLeakage.splitLeakageFromIndex(docs, idx)
        .select(col("id1"), col("split1"), col("id2"), col("split2"),
          col("n1"), col("n2"), col("inter"), Parity.r("jaccard", 4))
        .orderBy("id1", "id2")),
      ("source_dup_rate", () => SourceDupRate.sourceDupRateFromIndex(docs, idx)
        .orderBy("source")))

    var fromTotal = 0.0
    fromIndex.foreach { case (name, q) =>
      val (t, n) = time(q().count())
      fromTotal += t
      println(f"PAIRIDX fromidx $name%-23s ${t}%7.2f s  rows=$n")
    }
    println(f"PAIRIDX TOTAL inline=${inlineTotal}%.2f s  " +
      f"build=${tBuild}%.2f s  fromidx=${fromTotal}%.2f s  " +
      f"amortized=${tBuild + fromTotal}%.2f s  " +
      f"speedup=${inlineTotal / (tBuild + fromTotal)}%.2fx")
    spark.sql("DROP TABLE IF EXISTS graft_pair_idx")
    spark.stop()
  }
}
