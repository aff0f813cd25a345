package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TRAINING-WINDOW formation + provenance (round 8) — the last hop before
  * tensors: pretraining concatenates the shuffled corpus into one token
  * stream and chunks it into fixed [[ContextWindowTokens]]-token context
  * windows, document boundaries crossing freely. This operator computes,
  * per document, its GLOBAL token offset in that stream and the window
  * index range it feeds — which is simultaneously the packing plan (how
  * many windows, which docs straddle boundaries) and the PROVENANCE map
  * ("training example k ← these documents"), the artifact attribution
  * and memorization audits join against.
  *
  * The stream order is [[CorpusShuffle]]'s content-keyed order
  * (shard, shuffle_key, doc_id), so the whole plan — order, offsets,
  * window ids — is reproducible across re-ingests and engines. Token
  * counts are the BPE-ish [[TextOps.BpePattern]]; all arithmetic is
  * integer (running sums, integer division) — bit-exact on both engines.
  * A zero-token doc occupies a notional width of 1 for its window range
  * (`greatest(n_tokens, 1)`), so every doc maps to ≥1 window and the
  * convention is total (NULL text included).
  *
  * Scale shape: the [[Curation.tokenBudgetPackRange]] offset algebra at
  * shard granularity — per-shard exclusive running sums (parallel, one
  * window per shard partition), ONE tiny per-shard totals aggregation
  * whose running sum is the shard offset table (≤ 16^digits rows,
  * broadcast back) — no global sort, no single corpus-sized reducer. The
  * base frame feeds both the cumsum and the totals, so it is
  * localCheckpoint'd (the CC multi-consumer discipline; economics here,
  * not correctness — shard derives from data, not partition ids).
  */
object ContextPack {

  /** Tokens per training context window. */
  val ContextWindowTokens = 512L

  def contextPack(documents: DataFrame,
                  windowTokens: Long = ContextWindowTokens,
                  digits: Int = CorpusShuffle.ShardDigits): DataFrame = {
    val bpe = TextOps.BpePattern.replace("\\", "\\\\")
    val base = documents
      .withColumn("fingerprint",
        expr("md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"))
      .withColumn("shuffle_key", expr("md5(concat('graft-shuffle:', fingerprint))"))
      .withColumn("shard", expr(CorpusShuffle.shardExpr(digits)))
      .withColumn("n_tokens",
        expr(s"size(regexp_extract_all(coalesce(text, ''), '$bpe', 0))").cast("long"))
      .select("doc_id", "shuffle_key", "shard", "n_tokens")
      .localCheckpoint()
    val wIn = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("shard").agg(sum("n_tokens").as("total"))
      .withColumn("shard_offset", coalesce(sum("total").over(wOff), lit(0L)))
      .select(col("shard").as("o_shard"), col("shard_offset"))
    base
      .withColumn("within_start", coalesce(sum("n_tokens").over(wIn), lit(0L)))
      .join(broadcast(offsets), col("shard") === col("o_shard"))
      .drop("o_shard")
      .withColumn("global_start", col("shard_offset") + col("within_start"))
      .withColumn("window_first", expr(s"global_start div $windowTokens"))
      .withColumn("window_last",
        expr(s"(global_start + greatest(n_tokens, 1) - 1) div $windowTokens"))
      .withColumn("n_windows", col("window_last") - col("window_first") + lit(1L))
      .withColumn("crosses_boundary", col("window_last") > col("window_first"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("global_start"),
        col("window_first"), col("window_last"), col("n_windows"),
        col("crosses_boundary"))
  }

  def contextPackQ(documents: DataFrame): DataFrame =
    contextPack(documents).orderBy("doc_id")

  /** The REVERSE index of [[contextPack]] — per context window, the
    * documents that feed it: window id → n_docs, doc id range, and the
    * full sorted contributor list (one comma-joined string, hash-stable).
    * This is the provenance table an attribution or memorization audit
    * actually joins against ("training example k came from THESE docs"),
    * and the check that window formation is sane (every window has ≥1
    * contributor; neighbors overlap only through boundary-crossing docs).
    *
    * Scale shape: [[contextPack]]'s plan + one INLINE-generator explode of
    * `sequence(window_first, window_last)` (bounded per doc by
    * n_tokens/W + 1; first ≤ last always, so the sequence is never
    * descending) + one map-side-combinable aggregation on window_id.
    * |windows| ≈ total_tokens / W rows out. */
  def contextWindowDocs(documents: DataFrame): DataFrame =
    contextPack(documents)
      .select(col("doc_id"),
        explode(expr("sequence(window_first, window_last)")).as("window_id"))
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
        expr("array_join(transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING)), ',')")
          .as("doc_ids_csv"))
      .select(col("window_id"), col("n_docs"), col("first_doc"),
        col("last_doc"), col("doc_ids_csv"))

  def contextWindowDocsQ(documents: DataFrame): DataFrame =
    contextWindowDocs(documents).orderBy("window_id")

  /** Shared CTE chain (k → … → g: per-doc global_start) interpolated into
    * BOTH oracles so the stream definition cannot drift between them. */
  private def packCtes: String =
    s"""k AS (
       |  SELECT doc_id,
       |         md5('graft-shuffle:' ||
       |           md5(lower(trim(regexp_replace(COALESCE(text, ''), '\\s+', ' ', 'g'))))) AS shuffle_key,
       |         CAST(len(regexp_extract_all(COALESCE(text, ''), '${TextOps.BpePattern}')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, shuffle_key,
       |         ${CorpusShuffle.shardExpr(CorpusShuffle.ShardDigits)} AS shard,
       |         n_tokens
       |  FROM k
       |), c AS (
       |  SELECT doc_id, shard, n_tokens,
       |         COALESCE(sum(n_tokens) OVER (PARTITION BY shard ORDER BY shuffle_key, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS within_start
       |  FROM s
       |), t AS (
       |  SELECT shard, CAST(sum(n_tokens) AS BIGINT) AS total FROM s GROUP BY 1
       |), o AS (
       |  SELECT shard,
       |         COALESCE(sum(total) OVER (ORDER BY shard
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS shard_offset
       |  FROM t
       |), g AS (
       |  SELECT c.doc_id, c.shard, c.n_tokens,
       |         CAST(o.shard_offset + c.within_start AS BIGINT) AS global_start
       |  FROM c JOIN o ON c.shard = o.shard
       |)"""

  val contextPackSql: String = {
    val w = ContextWindowTokens
    s"""WITH $packCtes
       |SELECT doc_id, shard, n_tokens, global_start,
       |       global_start // $w AS window_first,
       |       (global_start + greatest(n_tokens, 1) - 1) // $w AS window_last,
       |       ((global_start + greatest(n_tokens, 1) - 1) // $w) - (global_start // $w) + 1 AS n_windows,
       |       ((global_start + greatest(n_tokens, 1) - 1) // $w) > (global_start // $w) AS crosses_boundary
       |FROM g
       |ORDER BY doc_id""".stripMargin
  }

  val contextWindowDocsSql: String = {
    val w = ContextWindowTokens
    s"""WITH $packCtes, e AS (
       |  SELECT doc_id,
       |         unnest(range(global_start // $w,
       |                      (global_start + greatest(n_tokens, 1) - 1) // $w + 1)) AS window_id
       |  FROM g
       |)
       |SELECT window_id,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       min(doc_id) AS first_doc,
       |       max(doc_id) AS last_doc,
       |       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids_csv
       |FROM e
       |GROUP BY window_id
       |ORDER BY window_id""".stripMargin
  }
}
