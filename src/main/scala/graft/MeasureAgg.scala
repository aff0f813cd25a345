package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Round-17: A/B variants of the pair-mine aggregation (the measured cost
  * center — MeasureMine: agg adds ~7.7 s over the 5.7 s candidate join,
  * zero spill, pure hash-insert CPU on 36.5M rows → 12.5M groups). */
object MeasureAgg {
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
      println(f"MEASURE $name%-40s median=${ts(1)}%7.2f s  (min=${ts.head}%.2f max=${ts.last}%.2f)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }

    val docs = Tables.documents(spark, sfDir)
    def ex = Dedup.shingleExploded(docs).select(col("doc_id"), expr("xxhash64(s)").as("sh"))
    def a = ex.select(col("doc_id").as("id1"), col("sh"))
    def b = ex.select(col("doc_id").as("id2"), col("sh"))
    def cand = a.join(b, Seq("sh")).filter(col("id1") < col("id2"))

    // V0: production shape (partial+final hash agg across an exchange)
    time("V0 hash partial+final")(cand.groupBy("id1", "id2").agg(count(lit(1)).as("inter")))

    // V1: explicit pair-keyed exchange first — partial agg then dedupes
    // FULLY within a partition, final agg is a near-no-op
    time("V1 repartition(id1,id2)+agg")(
      cand.repartition(col("id1"), col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter")))

    // V2: V1 + sorted input + sort-agg replacement (zero hash tables)
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    time("V2 repart+sortWithin+sortAgg")(
      cand.repartition(col("id1"), col("id2"))
        .sortWithinPartitions("id1", "id2")
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter")))
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")

    // V3: shuffled-hash-join hint on the candidate join (SMJ today)
    def candSHJ = a.hint("shuffle_hash").join(b, Seq("sh")).filter(col("id1") < col("id2"))
    time("V3 SHJ cand join only")(candSHJ)
    time("V3b SHJ + V0 agg")(candSHJ.groupBy("id1", "id2").agg(count(lit(1)).as("inter")))

    // V4: twolevel off + V0 (MeasureMine found this ~14% better)
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")
    time("V4 twolevel=off + V0")(cand.groupBy("id1", "id2").agg(count(lit(1)).as("inter")))
    // V5: twolevel off + V1
    time("V5 twolevel=off + V1")(
      cand.repartition(col("id1"), col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter")))
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")

    // V6: full pairIndex vs a no-τ-filter variant (skip the always-true
    // jaccard division+filter at τ=0)
    time("V6 pairIndex (prod)")(Dedup.pairIndex(docs))

    // V7: SHJ + pair-keyed exchange + sorted input + sort agg
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "true")
    time("V7 SHJ+repart+sortAgg")(
      candSHJ.repartition(col("id1"), col("id2"))
        .sortWithinPartitions("id1", "id2")
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter")))
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg", "false")
    // V8: SHJ + twolevel=off plain agg
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "false")
    time("V8 SHJ+twolevel=off+V0")(candSHJ.groupBy("id1", "id2").agg(count(lit(1)).as("inter")))
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")
    // V9: end-to-end pairIndex shape with SHJ: agg + broadcast size joins
    val sizesE = Dedup.shingleSets(docs).select(col("doc_id"), col("nsh"))
    time("V9 SHJ full pairIndex shape")(
      candSHJ.groupBy("id1", "id2").agg(count(lit(1)).as("inter"))
        .join(broadcast(sizesE.select(col("doc_id").as("id1"), col("nsh").as("n1"))), Seq("id1"))
        .join(broadcast(sizesE.select(col("doc_id").as("id2"), col("nsh").as("n2"))), Seq("id2"))
        .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2")))

    // V10: prod shape minus the sortWithinPartitions (is the sort inert?)
    time("V10 SHJ+repart, no sort")(
      candSHJ.repartition(col("id1"), col("id2"))
        .groupBy("id1", "id2").agg(count(lit(1)).as("inter")))

    spark.stop()
  }
}
