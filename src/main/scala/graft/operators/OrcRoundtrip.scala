package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ORC ROUND-TRIP (round 10) — the remaining built-in columnar format
  * as a driver-gate query (the source/sink inventory: parquet
  * everywhere, csv_ingest, jsonl_ingest; ORC is Spark's other native
  * columnar source and a 100 TB lake is routinely mixed-format).
  * The query writes the corpus to an on-disk ORC table (the
  * [[CommitLogRead]] temp-dir precedent), reads it back, and emits the
  * full row set; the ORACLE reads the original parquet — row/hash
  * agreement proves BYTE-FAITHFUL round-trip of BIGINTs and strings
  * (including multi-line / unicode text) through the second format.
  * DuckDB cannot read ORC, which is exactly why the check is shaped as
  * write→read-back→identity rather than a cross-engine ORC scan.
  *
  * Scale shape: one map-only write + one scan — no exchange anywhere
  * (the read-back preserves Spark's file-split parallelism; ORC predicate
  * pushdown/column pruning on the read side is pinned in OrcSpec, and
  * nested array<float> fidelity is OrcSpec's embeddings round-trip).
  */
object OrcRoundtrip {

  def orcRoundtripQ(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val dir = Files.createTempDirectory("graft_orc_q").resolve("docs").toString
    documents.select("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").orc(dir)
    spark.read.orc(dir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Oracle: the original parquet rows — identity is the claim. */
  val orcRoundtripSql: String =
    "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id"
}
