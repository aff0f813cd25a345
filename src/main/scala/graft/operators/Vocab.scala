package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-prep VOCABULARY build (round 8) — the corpus-level term
  * inventory a training pipeline computes before fitting a tokenizer or
  * filtering by term frequency: every unigram AND adjacent-pair bigram
  * (the BPE merge-candidate shape) with its total occurrence count (tf),
  * document frequency (df), and a dense frequency rank (`vocab_id`).
  * Downstream consumers: min-df cuts, merge-candidate selection,
  * frequency-based stopword discovery, OOV-rate estimation.
  *
  * Cross-engine exactness (§6): every output is an integer, a string, or
  * a boolean — no float anywhere, so Spark and DuckDB agree bit-for-bit.
  * The rank key (tf DESC, term ASC) is total because `term` is unique
  * within the vocabulary, so `vocab_id` is deterministic on both engines.
  *
  * Scale shape: ONE explode of the concatenated unigram+bigram array
  * (built inline at the Generate child — the named-column form re-computes
  * the transform in a scan-side Filter, the measured 11× trap), then two
  * map-side-combinable aggregations: (doc_id, term) → term. Both shuffles
  * carry narrow (string, long) rows. The final top-K is
  * `orderBy().limit(K)` — Spark plans TakeOrderedAndProject (per-partition
  * partial top-K, then a K-row merge on one reducer), NOT a global sort,
  * so the only driver-sized structure is the K-row vocabulary itself
  * (spec-pinned). The closing row_number window runs over those K rows.
  * At 100 TB: vocabulary size is corpus-sublinear (closed pools saturate;
  * open vocabularies are cut by [[MinDf]] and K), so every post-explode
  * frame is tiny relative to the corpus.
  */
object Vocab {

  /** Terms in fewer than this many documents never enter the vocabulary
    * (the standard noise cut — hapax typos, ids, hashes). */
  val MinDf = 2

  /** Vocabulary capacity: top-K by total occurrence count. */
  val VocabSize = 1000

  /** Unigrams + adjacent bigrams, occurrences preserved (tf counts every
    * occurrence, not per-doc presence — df covers that). The bigram slice
    * length is `greatest(size(w) - 1, 0)`, not a CASE guard, for the same
    * Generate-path reason as [[Curation.gramArrayExpr]]. */
  private[graft] val termArrayExpr: String =
    "concat(w, transform(slice(w, 1, greatest(size(w) - 1, 0)), (x, i) -> concat(x, ' ', w[i + 1])))"

  def vocabBuild(documents: DataFrame, minDf: Int = MinDf,
                 k: Int = VocabSize): DataFrame = {
    val terms = documents
      .select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
      .select(col("doc_id"), explode(expr(termArrayExpr)).as("term"))
    val perDoc = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val vocab = perDoc.groupBy("term")
      .agg(sum("c").as("tf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("tf").desc, col("term"))
      .limit(k)
    vocab
      .withColumn("vocab_id",
        row_number().over(Window.orderBy(col("tf").desc, col("term"))) - 1)
      .withColumn("is_bigram", expr("contains(term, ' ')"))
      .select(col("vocab_id"), col("term"), col("is_bigram"), col("tf"), col("df"))
  }

  def vocabBuildQ(documents: DataFrame): DataFrame =
    vocabBuild(documents).orderBy("vocab_id")

  val vocabBuildSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), terms AS (
       |  SELECT doc_id,
       |         unnest(list_concat(w, [w[i] || ' ' || w[i + 1] for i in range(1, len(w))])) AS term
       |  FROM toks
       |), tfd AS (
       |  SELECT doc_id, term, count(*) AS c FROM terms GROUP BY 1, 2
       |), v AS (
       |  SELECT term, CAST(sum(c) AS BIGINT) AS tf, CAST(count(*) AS BIGINT) AS df
       |  FROM tfd GROUP BY 1
       |), ranked AS (
       |  SELECT term, tf, df,
       |         row_number() OVER (ORDER BY tf DESC, term) - 1 AS vocab_id
       |  FROM v WHERE df >= $MinDf
       |)
       |SELECT vocab_id, term, contains(term, ' ') AS is_bigram, tf, df
       |FROM ranked
       |WHERE vocab_id < $VocabSize
       |ORDER BY vocab_id""".stripMargin
}
