package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Unregistered measurement tool (like MeasureRecall/StressDf2): isolate
  * where contamination_check's wall time goes at a given SF. Not part of
  * the driver surface.
  */
object ProfileContam {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def time(name: String)(f: => Unit): Unit = {
      // warmup then 2 timed
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $name%-40s ${ts.min}%8.3f s")
    }

    time("split only") {
      docs.select(expr("size(split(lower(trim(text)), '\\\\s+'))").as("n"))
        .agg(sum("n")).collect()
    }
    time("ngramSets n=2") {
      Curation.ngramSets(docs, 2).agg(sum("n_grams")).collect()
    }
    time("ngramSets n=8") {
      Curation.ngramSets(docs, 8).agg(sum("n_grams")).collect()
    }
    time("ngramSets n=8 explode+hash") {
      Curation.ngramSets(docs, 8)
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .select(expr("xxhash64(g)").as("h")).agg(bit_xor(col("h"))).collect()
    }
    time("explode count only") {
      Curation.ngramSets(docs, 8)
        .select(explode(col("grams")).as("g")).count()
    }
    time("explode noCASE count") {
      val tail = (1 until 8).map(j => s", ' ', w[i + $j]").mkString
      docs.select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
        .select(explode(expr(
          s"array_distinct(transform(slice(w, 1, size(w) - 7), (x, i) -> concat(x$tail)))")).as("g"))
        .count()
    }
    time("explode noCASE noDistinct count") {
      val tail = (1 until 8).map(j => s", ' ', w[i + $j]").mkString
      docs.select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
        .select(explode(expr(
          s"transform(slice(w, 1, size(w) - 7), (x, i) -> concat(x$tail))")).as("g"))
        .count()
    }
    time("explode greatest-guard count") {
      val tail = (1 until 8).map(j => s", ' ', w[i + $j]").mkString
      docs.select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
        .select(explode(expr(
          s"array_distinct(transform(slice(w, 1, greatest(size(w) - 7, 0)), (x, i) -> concat(x$tail)))")).as("g"))
        .count()
    }
    time("explode filter-guard bare slice count") {
      val tail = (1 until 8).map(j => s", ' ', w[i + $j]").mkString
      docs.select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
        .filter(expr("size(w) >= 8"))
        .select(explode(expr(
          s"array_distinct(transform(slice(w, 1, size(w) - 7), (x, i) -> concat(x$tail)))")).as("g"))
        .count()
    }
    time("explode n=2 count") {
      Curation.ngramSets(docs, 2)
        .select(explode(col("grams")).as("g")).count()
    }
    time("materialize grams then explode") {
      val g = Curation.ngramSets(docs, 8).localCheckpoint()
      g.select(explode(col("grams")).as("g")).count()
      g.unpersist()
    }
    time("bench set distinct+collect") {
      val g = Curation.ngramSets(docs, 8)
      g.filter(col("doc_id") % 20 === 7)
        .select(explode(col("grams")).as("gram"))
        .select(expr("xxhash64(gram)").as("gh")).distinct().count()
    }
    time("probe join only") {
      val g = Curation.ngramSets(docs, 8)
      val benchGrams = g.filter(col("doc_id") % 20 === 7)
        .select(explode(col("grams")).as("gram"))
        .select(expr("xxhash64(gram)").as("gh")).distinct()
      g.filter(col("doc_id") % 20 =!= 7)
        .select(col("doc_id"), explode(col("grams")).as("gram"))
        .select(col("doc_id"), expr("xxhash64(gram)").as("gh"))
        .join(broadcast(benchGrams), Seq("gh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit")).count()
    }
    time("full contaminationCheck") {
      Curation.contaminationCheck(docs).agg(count(lit(1))).collect()
    }
    time("Dedup.shingleSets explode count") {
      graft.operators.Dedup.shingleSets(docs)
        .select(col("doc_id"), explode(col("shingles")).as("s")).count()
    }
    time("Dedup direct-inline bigram explode count") {
      docs.select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', w[i + 1])))")).as("s"))
        .count()
    }
    println("=== SLOW: ngramSets.select(explode) ===")
    println(Curation.ngramSets(docs, 8).select(explode(col("grams")).as("g"))
      .queryExecution.executedPlan.toString)
    val tail8 = (1 until 8).map(j => s", ' ', w[i + $j]").mkString
    println("=== FAST: direct explode ===")
    println(docs.select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
      .select(explode(expr(
        s"array_distinct(transform(slice(w, 1, greatest(size(w) - 7, 0)), (x, i) -> concat(x$tail8)))")).as("g"))
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
