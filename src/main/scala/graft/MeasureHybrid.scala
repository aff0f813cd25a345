package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{BandPlan, Dedup}

/** Round-17: stage-level decomposition of PrefixJoin.hybridCore (the
  * dedup_prefix path — the one miner the pair-mine treatment didn't move).
  * Replicates the hybrid pipeline stage by stage at the auto-picked band
  * so each piece gets a number (scratch measurement tool; the production
  * code stays in PrefixJoin). */
object MeasureHybrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.execution.replaceHashWithSortAgg", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      noop(df)
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        noop(df)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"MEASURE $name%-34s median=${ts(1)}%7.2f s  (min=${ts.head}%.2f max=${ts.last}%.2f)")
    }
    def countOf(name: String)(df: DataFrame): Unit =
      println(f"MEASURE $name%-34s rows=${df.count()}%d")

    val docs = Tables.documents(spark, sfDir)
    val ThrNum = 4L; val ThrDen = 5L
    val ceilTau = s"(($ThrNum * nsh + $ThrDen - 1) div $ThrDen)"

    val exDf = Dedup.shingleExploded(docs)
      .select(col("doc_id"), expr("xxhash64(s)").as("sh"))
      .localCheckpoint()
    val dfs = exDf.groupBy("sh").agg(count(lit(1)).as("df"))
    val exJ = exDf.join(dfs, Seq("sh")).localCheckpoint()
    val band = BandPlan.recommendedBand(docs)
    println(s"MEASURE band=$band")

    val cold = exJ.filter(col("df") <= band).select("doc_id", "sh")
    countOf("cold rows")(cold)
    val coldPairs = cold.select(col("doc_id").as("id1"), col("sh"))
      .hint("shuffle_hash")
      .join(cold.select(col("doc_id").as("id2"), col("sh")), Seq("sh"))
      .filter(col("id1") < col("id2"))
      .repartition(col("id1"), col("id2"))
      .sortWithinPartitions("id1", "id2")
      .groupBy("id1", "id2").agg(count(lit(1)).as("ic"))
    time("coldPairs")(coldPairs)

    val docDims = exJ.groupBy("doc_id").agg(
      count(lit(1)).as("nsh"),
      sum(when(col("df") > band, 1L).otherwise(0L)).as("nhot"))
      .localCheckpoint()
    val hotHeavy = docDims.filter(col("nhot") >= expr(ceilTau)).select("doc_id", "nsh")
    countOf("hotHeavy docs")(hotHeavy)
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val hotPref = exJ.join(hotHeavy, Seq("doc_id"))
      .withColumn("rnk", row_number().over(byRarity))
      .filter(col("rnk") <= expr(s"nsh - $ceilTau + 1") && col("df") > band)
      .select("doc_id", "sh")
    countOf("hotPref rows")(hotPref)
    time("hotPref")(hotPref)
    val hotCand = hotPref.select(col("doc_id").as("id1"), col("sh"))
      .hint("shuffle_hash")
      .join(hotPref.select(col("doc_id").as("id2"), col("sh")), Seq("sh"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2")
      .repartition(col("id1"), col("id2"))
      .sortWithinPartitions("id1", "id2")
      .distinct()
    countOf("hotCand pairs")(hotCand)
    time("hotCand")(hotCand)
    val hotCandM = hotCand.localCheckpoint()
    val overlap = hotCandM
      .join(cold.select(col("doc_id").as("id1"), col("sh")), Seq("id1"))
      .join(cold.select(col("doc_id").as("id2"), col("sh")), Seq("id2", "sh"))
      .select("id1", "id2").distinct()
    time("overlap")(overlap)
    val hotOnlyPairs = hotCandM.join(overlap, Seq("id1", "id2"), "left_anti")
      .withColumn("ic", lit(0L))
    val pairsPre = coldPairs.unionByName(hotOnlyPairs)
      .join(broadcast(docDims.select(col("doc_id").as("id1"), col("nsh").as("n1"),
        col("nhot").as("nh1"))), Seq("id1"))
      .join(broadcast(docDims.select(col("doc_id").as("id2"), col("nsh").as("n2"),
        col("nhot").as("nh2"))), Seq("id2"))
      .filter(expr(s"($ThrNum + $ThrDen) * (ic + least(nh1, nh2)) >= $ThrNum * (n1 + n2)"))
      .select("id1", "id2", "ic", "n1", "n2")
    countOf("pairs post-feasibility")(pairsPre)
    time("pairs assembly")(pairsPre)
    val pairs = pairsPre.localCheckpoint()
    val hot = exJ.filter(col("df") > band).select("doc_id", "sh")
    val interHot = pairs.select("id1", "id2")
      .join(hot.select(col("doc_id").as("id1"), col("sh")), Seq("id1"))
      .join(hot.select(col("doc_id").as("id2"), col("sh")), Seq("id2", "sh"))
      .repartition(col("id1"), col("id2"))
      .sortWithinPartitions("id1", "id2")
      .groupBy("id1", "id2").agg(count(lit(1)).as("ih"))
    time("interHot")(interHot)

    spark.stop()
  }
}
