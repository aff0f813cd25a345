package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic TRAINING-ORDER shuffle + shard assignment (round 8) —
  * the step between curation and the training job: give every document a
  * reproducible pseudo-random position so the training data order is (a)
  * decorrelated from ingest order (no source/time runs feeding the model
  * correlated batches) and (b) bit-identical across re-runs. Output: a
  * shard number (the training-file granule) and the document's position
  * within its shard; (shard, pos_in_shard) is a total order over the
  * corpus.
  *
  * The shuffle key is CONTENT-derived, like [[TextOps.corpusSplit]] and
  * [[Sampling.corpusSample]]: md5 over a salted dedup fingerprint, so
  * re-ingesting the same corpus reproduces the exact order regardless of
  * doc_id assignment (spec-pinned; exact duplicates tie on the key and
  * break deterministically by doc_id). Shard = the integer value of the
  * key's first [[ShardDigits]] hex chars — both engines read the digits
  * through CASE tables generated from ONE Scala map (the
  * [[Sampling]] pattern), so no integer-conversion builtin with
  * engine-specific semantics is in the path.
  *
  * Scale shape: the key and shard are a fused map pass; pos_in_shard is
  * one row_number window hash-partitioned by shard. Parallelism equals
  * the shard count, and the shard count is a DIAL ([[ShardDigits]]: 16^d
  * shards) that in production tracks the output file count — a 100 TB
  * corpus ships thousands of ~GB shards, so per-shard windows stay
  * bounded and every reducer gets corpus/16^d rows (md5 uniformity; the
  * gate setting d=1 keeps the oracle's 16 partitions populated at 500
  * docs). For a single giant shard the range-partition + offset form of
  * [[Curation.tokenBudgetPackRange]] is the documented escape hatch.
  */
object CorpusShuffle {

  /** Hex digits of the key that become the shard id: 16^d shards. */
  val ShardDigits = 1

  private val HexDigits = "0123456789abcdef"

  /** `CASE substring(key, pos, 1) WHEN '0' THEN 0 … WHEN 'f' THEN 15 END`
    * — identical text on both engines. */
  private def digitCase(pos: Int): String =
    HexDigits.zipWithIndex
      .map { case (c, v) => s"WHEN '$c' THEN $v" }
      .mkString(s"CASE substring(shuffle_key, $pos, 1) ", " ", " ELSE 0 END")

  /** Σ 16^i · digit_i over the first `digits` hex chars. */
  private[graft] def shardExpr(digits: Int): String =
    (1 to digits)
      .map(p => s"${math.pow(16, digits - p).toInt} * (${digitCase(p)})")
      .mkString(" + ")

  def corpusShuffle(documents: DataFrame, digits: Int = ShardDigits): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("shuffle_key"), col("doc_id"))
    documents
      .withColumn("fingerprint",
        expr("md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"))
      .withColumn("shuffle_key", expr("md5(concat('graft-shuffle:', fingerprint))"))
      .withColumn("shard", expr(shardExpr(digits)))
      .withColumn("pos_in_shard", row_number().over(w))
      .select(col("doc_id"), col("shuffle_key"), col("shard"), col("pos_in_shard"))
  }

  def corpusShuffleQ(documents: DataFrame): DataFrame =
    corpusShuffle(documents).orderBy("shard", "pos_in_shard")

  val corpusShuffleSql: String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |         md5('graft-shuffle:' ||
       |           md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))))) AS shuffle_key
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, shuffle_key,
       |         ${shardExpr(ShardDigits)} AS shard
       |  FROM k
       |)
       |SELECT doc_id, shuffle_key, shard,
       |       row_number() OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id) AS pos_in_shard
       |FROM s
       |ORDER BY shard, pos_in_shard""".stripMargin
}
