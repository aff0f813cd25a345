package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Unregistered measurement tool (StressDf2 family): where does
  * dedup_incremental's batch-side broadcast stop paying? Round 7 made the
  * hint a dial (`broadcastBatch`); this measures both settings on the 10×
  * uniform corpus (StressDf2's rotation-replica generator) at two batch
  * fractions:
  *
  *   - batchMod=5 → 20% batch: the daily-ingest shape the default targets;
  *   - batchMod=2 → 50% batch: a backfill-sized batch, the case the dial
  *     exists for.
  *
  * Both settings are output-identical (spec); the question is wall time
  * and the broadcast-relation size trend, so the threshold guidance in the
  * scaladoc carries a number instead of a hunch.
  */
object StressIncrBatch {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_stress_incr"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, baseDir)
    val uniform10x = base
      .withColumn("r", explode(expr("sequence(0, 9)")))
      .withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
      .withColumn("rot", expr("concat(slice(w, r + 1, size(w) - r), slice(w, 1, r))"))
      .select((col("doc_id") * lit(10L) + col("r")).as("doc_id"),
        array_join(col("rot"), " ").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
    val path = s"$workDir/uniform10x"
    uniform10x.write.mode("overwrite").parquet(path)
    val uni = spark.read.parquet(path)

    def time(name: String)(mk: => DataFrame): Unit = {
      val passes = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME config=$name sec=${passes.min}%.1f passes=${passes.map(p => f"$p%.1f").mkString("/")}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    // batch-side row volumes so the timings are interpretable
    for (mod <- Seq(5L, 2L)) {
      val b = Dedup.shingleSets(uni.filter(col("doc_id") % mod === 0))
        .agg(count(lit(1)).as("docs"), sum("nsh").as("shingle_rows")).head()
      println(s"STATS mod=$mod batch_docs=${b.getLong(0)} batch_shingle_rows=${b.getLong(1)}")
    }

    Dedup.dedupIncremental(base).write.format("noop").mode("overwrite").save() // warmup

    for (mod <- Seq(5L, 2L); bc <- Seq(true, false)) {
      time(s"exact_mod${mod}_bcast$bc") {
        Dedup.dedupIncremental(uni, batchMod = mod, broadcastBatch = bc)
      }
    }
    for (mod <- Seq(5L, 2L); bc <- Seq(true, false)) {
      time(s"lsh_mod${mod}_bcast$bc") {
        Dedup.dedupIncrementalLsh(uni, batchMod = mod, broadcastBatch = bc)
      }
    }
    spark.stop()
  }
}
