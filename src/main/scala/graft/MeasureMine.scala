package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-17 optimization round: stage-level timing of the τ=0 exact
  * pair-mine family (the bench's slowest-8 share it). Times each stage of
  * [[Dedup.ngramJaccardPairs]] in isolation against the noop sink (guide
  * §1.4) so the expensive term is identified by MEASUREMENT, not plan
  * guesswork — the corpus is 1.5 MB of text, so parse work and join work
  * have very different orders of magnitude here.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.MeasureMine"
  */
object MeasureMine {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-measurement task-metric totals (spill + shuffle bytes): the
    // question E1 must answer is whether the pair agg is SPILLING under
    // the 8g default heap or just doing a lot of in-memory work
    val mShuffleR = new java.util.concurrent.atomic.AtomicLong
    val mShuffleW = new java.util.concurrent.atomic.AtomicLong
    val mSpillMem = new java.util.concurrent.atomic.AtomicLong
    val mSpillDisk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          mShuffleR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          mShuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          mSpillMem.addAndGet(m.memoryBytesSpilled)
          mSpillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      // warmup once, then median of 3 (the Bench discipline, scaled down)
      noop(df)
      mShuffleR.set(0); mShuffleW.set(0); mSpillMem.set(0); mSpillDisk.set(0)
      val ts = Seq.fill(3) {
        spark.sparkContext.setJobDescription(name)
        val t0 = System.nanoTime()
        noop(df)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      def mb(v: Long): Double = v / 3.0 / 1e6 // per-pass average
      println(f"MEASURE $name%-28s median=${ts(1)}%7.2f s  (min=${ts.head}%.2f max=${ts.last}%.2f)" +
        f"  shufW=${mb(mShuffleW.get)}%8.1f MB  spillMem=${mb(mSpillMem.get)}%8.1f MB  spillDisk=${mb(mSpillDisk.get)}%8.1f MB")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    val docs = Tables.documents(spark, sfDir)

    // stage 1: parse + shingle + explode + hash (one pass over text)
    def ex = Dedup.shingleExploded(docs).select(col("doc_id"), expr("xxhash64(s)").as("sh"))
    time("ex_parse")(ex)
    // stage 1b: the sizes frame (a second full parse in the current plan)
    time("sizes_parse")(Dedup.shingleSets(docs).select("doc_id", "nsh"))
    // stage 2: the candidate self-join (Σ df² rows out)
    def cand = ex.select(col("doc_id").as("id1"), col("sh"))
      .join(ex.select(col("doc_id").as("id2"), col("sh")), Seq("sh"))
      .filter(col("id1") < col("id2"))
    time("cand_join")(cand)
    // stage 3: + the (id1,id2) count aggregation
    time("pair_agg")(cand.groupBy("id1", "id2").agg(count(lit(1)).as("inter")))
    // stage 4: the full τ=0 index (agg + size join-backs)
    time("pair_index_full")(Dedup.pairIndex(docs))
    // stage 5: the registered τ=0.8 query (adds jaccard filter + order)
    time("ngram_q")(Dedup.ngramJaccardQ(docs))

    // dedup_prefix: which regime does the auto band pick on this corpus,
    // and how do the hybrid / pure-prefix forms compare?
    {
      import graft.operators.BandPlan
      val band = BandPlan.recommendedBand(docs)
      val dfs = Dedup.shingleExploded(docs)
        .select(col("doc_id"), expr("xxhash64(s)").as("sh"))
        .groupBy("sh").agg(count(lit(1)).as("df"))
      val r = dfs.agg(min("df"), max("df")).head()
      println(s"MEASURE band_pick band=$band dfRange=[${r.get(0)}, ${r.get(1)}]")
    }
    time("hybrid_q (dedup_prefix)")(graft.operators.PrefixJoin.hybridJaccardQ(docs))
    time("pure_prefix_q")(graft.operators.PrefixJoin.prefixJaccardQ(docs))

    // config A/B on the cost center: does the partial-agg fast hash map
    // capacity move the (id1,id2) aggregation? (codegen-time conf)
    def pairAgg = cand.groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
    for (bit <- Seq("16", "20", "24")) {
      spark.conf.set("spark.sql.codegen.aggregate.fastHashMap.capacityBit", bit)
      time(s"pair_agg capBit=$bit")(pairAgg)
    }
    spark.conf.set("spark.sql.codegen.aggregate.fastHashMap.capacityBit", "16")
    // does two-level map help or hurt at ~1M groups/task?
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")
    time("pair_agg twolevel=off")(pairAgg)
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")

    spark.stop()
  }
}
