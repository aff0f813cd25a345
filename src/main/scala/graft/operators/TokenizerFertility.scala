package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TOKENIZER FERTILITY (round 8, continuation 5) — the tokenizer-eval
  * readout over [[TokenizeIds]]'s id stream: per source, token volume,
  * out-of-vocabulary rate, and chars-per-token "fertility" — the
  * numbers a tokenizer/vocab swap is judged by (a vocab that UNKs 4%
  * of one source silently biases the mixture against it, and fertility
  * drift is how a domain's token budget quietly doubles). Completes
  * the vocab chain: [[Vocab.vocabBuild]] learns it, [[TokenizeIds]]
  * applies it, `vocab_coverage` prices it corpus-wide — this prices it
  * PER SOURCE, where the mixture decisions ([[MixturePlan]]) are made.
  *
  * Cross-engine exactness (SURVEY §6): exact BIGINT token/UNK/char
  * counts off the shared id stream (the oracle nests
  * [[TokenizeIds.tokenizeIdsSql]] verbatim — one text, can't drift);
  * ratios are integer ppm / milli with non-negative operands
  * (floor ≡ trunc). Docs whose text yields no token rows (NULL text)
  * are absent from the stream and thus from `n_docs` — the stream's
  * own convention, pinned in the spec.
  *
  * Scale shape: the token stream collapses PER DOC first (map-side
  * combinable, doc-keyed — same exchange family as the stream's own
  * (doc, pos) order), then joins the thin documents spine doc-keyed
  * (collapse-before-join; both sides |docs|-sized) and folds to
  * |sources| rows. The vocab lookup inside [[TokenizeIds]] stays the
  * K-row broadcast it always was; no corpus-proportional hints.
  */
object TokenizerFertility {

  def tokenizerFertility(documents: DataFrame,
                         vocab: Option[DataFrame] = None): DataFrame = {
    val perDoc = TokenizeIds.tokenizeIds(documents, vocab)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(expr("CASE WHEN is_unk THEN 1 ELSE 0 END")).as("n_unk"),
        sum(length(col("token"))).as("n_chars"))
    perDoc
      .join(documents.select(col("doc_id").as("d_id"), col("source")),
        col("doc_id") === col("d_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        sum("n_unk").as("n_unk"), sum("n_chars").as("n_token_chars"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_unk"),
        expr("(n_unk * 1000000) div n_tokens").as("unk_ppm"),
        col("n_token_chars"),
        expr("(n_token_chars * 1000) div n_tokens").as("chars_per_token_milli"))
  }

  def tokenizerFertilityQ(documents: DataFrame): DataFrame =
    tokenizerFertility(documents).orderBy("source")

  /** [[TokenizeIds.tokenizeIdsSql]] nested verbatim as the stream. */
  val tokenizerFertilitySql: String =
    s"""WITH stream AS (
       |  SELECT * FROM (${TokenizeIds.tokenizeIdsSql.replace("\n", "\n       |  ")})
       |), per_doc AS (
       |  SELECT doc_id,
       |         CAST(count(*) AS BIGINT) AS n_tok,
       |         CAST(sum(CASE WHEN is_unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
       |         CAST(sum(length(token)) AS BIGINT) AS n_chars
       |  FROM stream GROUP BY 1
       |), bysrc AS (
       |  SELECT d.source,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(p.n_tok) AS BIGINT) AS n_tokens,
       |         CAST(sum(p.n_unk) AS BIGINT) AS n_unk,
       |         CAST(sum(p.n_chars) AS BIGINT) AS n_token_chars
       |  FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
       |  GROUP BY 1
       |)
       |SELECT source, n_docs, n_tokens, n_unk,
       |       (n_unk * 1000000) // n_tokens AS unk_ppm,
       |       n_token_chars,
       |       (n_token_chars * 1000) // n_tokens AS chars_per_token_milli
       |FROM bysrc
       |ORDER BY source""".stripMargin
}
