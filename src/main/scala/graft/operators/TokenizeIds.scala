package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenize-to-ids (round 8) — applying [[Vocab.vocabBuild]]'s learned
  * vocabulary to the corpus: every token position mapped to its vocab id
  * (UNK = -1 for out-of-vocabulary), the id stream a tensor writer
  * consumes after [[CorpusShuffle]] orders it and [[ContextPack]] windows
  * it. Unigram mapping only: the vocabulary's bigram entries exist for
  * salience/merge STATISTICS, and a greedy longest-match merge over them
  * is an inherently sequential per-doc recurrence — the [[Iir]] class of
  * operator, deliberately not faked relationally here.
  *
  * Scale shape: inline posexplode of the token split (one generator, the
  * §invariants rule) → one BROADCAST join against the vocabulary — the
  * K-row vocab is the canonical broadcast fact (bounded by
  * [[Vocab.VocabSize]], never by the corpus), so the id assignment is a
  * map-side hash lookup with zero shuffle of the token stream; output
  * order rides (doc_id, pos). The vocabulary build pays its own
  * aggregation once and is amortized across every tokenization run — at
  * 100 TB it is the persisted asset, the token stream is never.
  */
object TokenizeIds {

  def tokenizeIds(documents: DataFrame,
                  vocab: Option[DataFrame] = None): DataFrame = {
    val v = vocab.getOrElse(Vocab.vocabBuild(documents))
      .filter(!col("is_bigram"))
      .select(col("term"), col("vocab_id"))
    documents
      .select(col("doc_id"),
        posexplode(expr("split(lower(trim(text)), '\\\\s+')")).as(Seq("pos", "token")))
      .join(broadcast(v), col("token") === col("term"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"),
        coalesce(col("vocab_id"), lit(-1L)).as("token_id"),
        col("vocab_id").isNull.as("is_unk"))
  }

  def tokenizeIdsQ(documents: DataFrame): DataFrame =
    tokenizeIds(documents).orderBy("doc_id", "pos")

  /** DuckDB twin: [[Vocab.vocabBuildSql]] nested verbatim as the vocab
    * relation (one text, can't drift), zipped unnest(range ∥ list) for
    * (pos, token) — the CsvIngest oracle convention. */
  val tokenizeIdsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), ex AS (
       |  SELECT doc_id,
       |         CAST(unnest(range(len(w))) AS BIGINT) AS pos,
       |         unnest(w) AS token
       |  FROM tok
       |), uni AS (
       |  SELECT term, vocab_id
       |  FROM (${Vocab.vocabBuildSql.replace("\n", "\n       |  ")})
       |  WHERE NOT is_bigram
       |)
       |SELECT e.doc_id, e.pos, e.token,
       |       COALESCE(u.vocab_id, -1) AS token_id,
       |       u.vocab_id IS NULL AS is_unk
       |FROM ex e LEFT JOIN uni u ON u.term = e.token
       |ORDER BY e.doc_id, e.pos""".stripMargin
}
