package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping sliding-window chunking (round 8) — the retrieval-side twin
  * of [[ContextPack]]: where context_pack tiles ONE concatenated token
  * stream gap-free for training, doc_chunk windows EACH document
  * independently with a stride smaller than the window (here 32 tokens
  * every 24 → 8-token overlap), the standard chunker in front of an
  * embedding/retrieval index so no sentence is stranded at a chunk
  * boundary. Chunk starts at token offsets 0, S, 2S, … while the offset is
  * inside the doc, so every token belongs to ⌈W/S⌉ chunks in steady state
  * and the tail chunk is short, never empty.
  *
  * Token convention: whitespace split over coalesce(text, '') — the
  * ws_tokens definition of [[TextOps.tokenCount]]; every doc (including
  * empty/NULL text, which splits to one empty token) yields ≥ 1 chunk, so
  * the operator is total and `sum(n_chunk_tokens) - overlap·(n_chunks-1) =
  * n_tokens` is an exact per-doc invariant (spec-pinned).
  *
  * Scale shape: pure map + inline generator — zero exchanges before the
  * output sort (spec-pinned). The generator explodes
  * `sequence(0, (n-1) div S)` INLINE (the §invariants explode rule: a
  * named projected generator column invites InferFiltersFromGenerate to
  * recompute the array in a scan-side Filter); the token array `w` itself
  * is projected once and shared by the slice/join expressions. Output is
  * ~n/S rows per doc with ~W tokens each — the ~W/S× amplification is the
  * retrieval-index input, written partitioned, never re-shuffled here.
  */
object DocChunk {

  val ChunkTokens = 32
  val ChunkStride = 24

  def docChunk(documents: DataFrame,
               w: Int = ChunkTokens, s: Int = ChunkStride): DataFrame =
    documents
      .select(col("doc_id"),
        expr("split(trim(coalesce(text, '')), '\\\\s+')").as("w"))
      .select(col("doc_id"), col("w"),
        explode(expr(s"sequence(0L, CAST((size(w) - 1) div $s AS BIGINT))")).as("chunk_id"))
      .withColumn("start_tok", expr(s"chunk_id * ${s}L"))
      .withColumn("n_chunk_tokens",
        expr(s"least(CAST($w AS BIGINT), size(w) - start_tok)"))
      .withColumn("chunk_text",
        expr("array_join(slice(w, CAST(start_tok + 1 AS INT), CAST(n_chunk_tokens AS INT)), ' ')"))
      .withColumn("n_tokens", expr("CAST(size(w) AS BIGINT)"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        col("n_chunk_tokens"), col("chunk_text"), col("n_tokens"))

  def docChunkQ(documents: DataFrame): DataFrame =
    docChunk(documents).orderBy("doc_id", "chunk_id")

  val docChunkSql: String = {
    val (w, s) = (ChunkTokens, ChunkStride)
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         string_split_regex(trim(COALESCE(text, '')), '\\s+') AS w
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, w,
       |         CAST(unnest(generate_series(0, (len(w) - 1) // $s)) AS BIGINT) AS chunk_id
       |  FROM tok
       |)
       |SELECT doc_id, chunk_id,
       |       chunk_id * $s AS start_tok,
       |       least($w, len(w) - chunk_id * $s) AS n_chunk_tokens,
       |       array_to_string(list_slice(w, chunk_id * $s + 1,
       |         chunk_id * $s + least($w, len(w) - chunk_id * $s)), ' ') AS chunk_text,
       |       CAST(len(w) AS BIGINT) AS n_tokens
       |FROM c
       |ORDER BY doc_id, chunk_id""".stripMargin
  }
}
