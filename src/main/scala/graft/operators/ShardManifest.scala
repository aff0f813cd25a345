package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard MANIFEST (round 8) — the summary table a training job
  * reads to plan its run over [[CorpusShuffle]]'s shards: per shard, the
  * doc count, token mass (sequence-budget planning), the shard's key
  * range in the deterministic training order, and an integrity checksum
  * over the ordered member ids — the value a loader compares after
  * re-materializing a shard to prove it got exactly the docs the shuffle
  * assigned, in order. Same derivation as corpus_shuffle (shared
  * [[CorpusShuffle.shardExpr]] CASE tables), so the manifest can never
  * drift from the assignment it describes.
  *
  * Scale shape: one fused map pass (fingerprint, key, shard, tokens) →
  * one shard-keyed aggregation; output is 16^digits rows. The checksum is
  * md5 over the comma-joined member ids in shard order — exact and
  * engine-portable; its per-shard input is the shard's member list, fine
  * at ~GB-shard granularity (ids, not text), and a corpus whose shard
  * membership lists outgrow a reducer takes a commutative hash-SUM per
  * shard instead (order-free, same manifest contract, weaker adversarial
  * guarantees — a trade to document, not silently make).
  */
object ShardManifest {

  private val BpeExpr = {
    val bpe = TextOps.BpePattern.replace("\\", "\\\\")
    s"CAST(size(regexp_extract_all(coalesce(text, ''), '$bpe', 0)) AS BIGINT)"
  }

  def shardManifest(documents: DataFrame,
                    digits: Int = CorpusShuffle.ShardDigits): DataFrame =
    documents
      .withColumn("fingerprint",
        expr("md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"))
      .withColumn("shuffle_key", expr("md5(concat('graft-shuffle:', fingerprint))"))
      .withColumn("shard", expr(CorpusShuffle.shardExpr(digits)))
      .withColumn("bpe_tokens", expr(BpeExpr))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("bpe_tokens").as("n_tokens"),
        min("shuffle_key").as("first_key"),
        max("shuffle_key").as("last_key"),
        expr("""md5(array_join(transform(
               |  array_sort(collect_list(struct(shuffle_key, doc_id))),
               |  x -> CAST(x.doc_id AS STRING)), ','))""".stripMargin)
          .as("id_checksum"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("first_key"), col("last_key"), col("id_checksum"))

  def shardManifestQ(documents: DataFrame): DataFrame =
    shardManifest(documents).orderBy("shard")

  val shardManifestSql: String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |         md5('graft-shuffle:' ||
       |           md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))))) AS shuffle_key,
       |         CAST(len(regexp_extract_all(COALESCE(text, ''), '${TextOps.BpePattern}')) AS BIGINT) AS bpe_tokens
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, shuffle_key, bpe_tokens,
       |         ${CorpusShuffle.shardExpr(CorpusShuffle.ShardDigits)} AS shard
       |  FROM k
       |)
       |SELECT shard,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(bpe_tokens) AS BIGINT) AS n_tokens,
       |       min(shuffle_key) AS first_key,
       |       max(shuffle_key) AS last_key,
       |       md5(string_agg(CAST(doc_id AS VARCHAR), ','
       |             ORDER BY shuffle_key, doc_id)) AS id_checksum
       |FROM s
       |GROUP BY shard
       |ORDER BY shard""".stripMargin
}
