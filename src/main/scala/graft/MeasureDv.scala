package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.CommitLog

/** Scratch measurement (the MeasureGeometry convention): the
  * deletion-vector READ TAX — what a snapshot pays per scan while it
  * carries DVs, and that OPTIMIZE takes the tax back to zero. Builds a
  * CommitLog table from the sf documents, times a full aggregate scan
  * (a) clean, (b) after a scattered ~1% DV delete (the anti-join
  * present), (c) after OPTIMIZE rebases the vectors away. Copy-on-write
  * is timed on an identical second table for the WRITE-side contrast
  * (the economics the verb exists for). */
object MeasureDv {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, baseDir)
      .select(col("doc_id"), col("source"), col("text"))

    def mkTable(): String = {
      val t = java.nio.file.Files.createTempDirectory("graft_mdv")
        .resolve("t").toString
      CommitLog.append(spark, t,
        docs.repartitionByRange(10, col("doc_id"))
          .sortWithinPartitions("doc_id"))
      t
    }
    def scan(t: String): (Double, Long) = {
      val r = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = CommitLog.read(spark, t)
          .agg(count(lit(1)), sum(length(col("text")))).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      (r.map(_._1).min, r.head._2)
    }
    val cond = col("doc_id") % 97 === 0

    val tDv = mkTable()
    val (clean, n0) = scan(tDv)
    var t0 = System.nanoTime()
    CommitLog.deleteWhereDv(spark, tDv, cond)
    val dvWrite = (System.nanoTime() - t0) / 1e9
    val (taxed, n1) = scan(tDv)
    CommitLog.compact(spark, tDv, targetFiles = 10)
    val (rebased, n2) = scan(tDv)

    val tCow = mkTable()
    t0 = System.nanoTime()
    CommitLog.deleteWhere(spark, tCow, cond)
    val cowWrite = (System.nanoTime() - t0) / 1e9
    val rewritten = CommitLog.commitAt(tCow,
      CommitLog.latestVersion(tCow)).removes.size

    println(f"MEASURE_DV rows_clean=$n0 rows_after=$n1 rows_rebased=$n2 " +
      f"scan_clean=$clean%.2f scan_dv=$taxed%.2f scan_rebased=$rebased%.2f " +
      f"dv_delete=$dvWrite%.2f cow_delete=$cowWrite%.2f cow_files_rewritten=$rewritten")
    spark.stop()
  }
}
