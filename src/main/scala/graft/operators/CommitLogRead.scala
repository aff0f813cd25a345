package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.CommitLog

/** The commit-log table format, driven END-TO-END as a driver-gate query
  * (reference surface: delta_bronze.py:4 / check.py:4 `DeltaTable` —
  * versioned reads over a transaction log): build a real on-disk
  * [[CommitLog]] table from the corpus, run the full verb set against
  * it, and emit every version's row set. The oracle computes the same
  * frames directly from `documents`, so the protocol's read-at-version
  * answers are checked row-for-row by DuckDB — not just by sbt specs.
  *
  * Version ↔ verb script (all deterministic functions of doc_id):
  *  - v0 APPEND           rows with doc_id % 3 = 0
  *  - v1 APPEND           rows with doc_id % 3 = 1
  *  - v2 REPLACE (DELETE) copy-on-write rewrite keeping doc_id % 2 = 1
  *  -    CHECKPOINT at v2 (v2+ reads fold from it — exercised, not traced)
  *  - v3 APPEND           rows with doc_id % 3 = 2
  *  - v4 RESTORE to v1    (un-deletes via a new commit; history intact)
  *  - v5 OPTIMIZE         compaction — content-identical to v4
  *
  * Scale note: the table build is |documents|-sized parquet writes plus
  * O(commits) driver-side log-file creates — the log fold never touches
  * data (the CommitLog design); each versioned read hands Spark a closed
  * file list, so the union below is six pruned scans, not a directory
  * walk. The v2 rewrite here replaces the FULL live set (a DELETE-via-
  * compaction); the file-granular copy-on-write (rewrite only affected
  * files) is CommitLogSpec's replay fixture.
  */
object CommitLogRead {

  def commitLogReadQ(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val base = documents.select(col("doc_id"), col("source"), col("n_chars"))
    val table = Files.createTempDirectory("graft_cl_q").resolve("t").toString
    def must(r: Either[CommitLog.Conflict, Long]): Long = r match {
      case Right(v) => v
      case Left(c) => throw new IllegalStateException(s"unexpected conflict: $c")
    }
    CommitLog.append(spark, table, base.filter(col("doc_id") % 3 === 0)) // v0
    CommitLog.append(spark, table, base.filter(col("doc_id") % 3 === 1)) // v1
    val kept = CommitLog.read(spark, table, Some(1L))
    val keptRows =
      if (kept.columns.isEmpty) base.limit(0) // empty-corpus table: no data files yet
      else kept.filter(col("doc_id") % 2 === 1)
    val adds = CommitLog.stage(table, keptRows)
    must(CommitLog.replaceFiles(table, 1L, CommitLog.liveFiles(table, 1L), adds)) // v2
    CommitLog.checkpoint(table, 2L)
    CommitLog.append(spark, table, base.filter(col("doc_id") % 3 === 2)) // v3
    must(CommitLog.restore(table, 1L)) // v4
    must(CommitLog.compact(spark, table, targetFiles = 2)) // v5
    (0L to 5L).map { v =>
      val df = CommitLog.read(spark, table, Some(v))
      val withSchema = if (df.columns.isEmpty) base.limit(0) else df
      withSchema.select(lit(v).as("version"), col("doc_id"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .orderBy("version", "doc_id")
  }

  /** The same six versioned row sets derived directly from `documents`:
    * v0 = thirds-0; v1 = thirds-0∪1; v2 = v1 minus even ids; v3 = v2 plus
    * thirds-2; v4 = restore(v1) = v1; v5 = compaction of v4 = v1. */
  val commitLogReadSql: String =
    """WITH base AS (
      |  SELECT doc_id, source, n_chars FROM documents
      |), v AS (
      |  SELECT CAST(0 AS BIGINT) AS version, * FROM base WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT CAST(1 AS BIGINT), * FROM base WHERE doc_id % 3 <= 1
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), * FROM base WHERE doc_id % 3 <= 1 AND doc_id % 2 = 1
      |  UNION ALL
      |  SELECT CAST(3 AS BIGINT), * FROM base
      |  WHERE (doc_id % 3 <= 1 AND doc_id % 2 = 1) OR doc_id % 3 = 2
      |  UNION ALL
      |  SELECT CAST(4 AS BIGINT), * FROM base WHERE doc_id % 3 <= 1
      |  UNION ALL
      |  SELECT CAST(5 AS BIGINT), * FROM base WHERE doc_id % 3 <= 1
      |)
      |SELECT version, doc_id, source, n_chars
      |FROM v
      |ORDER BY version, doc_id""".stripMargin
}
