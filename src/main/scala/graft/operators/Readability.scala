package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** READABILITY scoring (round 8, continuation) — the Flesch–Kincaid grade
  * estimate, the standard complexity signal edu-value and
  * audience-targeting filters read (too-low grade ≈ fragment soup,
  * too-high ≈ legalese/OCR garbage; both are curation signals the
  * quality composite doesn't capture).
  *
  * The three inputs are EXACT integers both engines compute identically:
  * sentences = non-empty `[.!?]+`-delimited segments (floor 1 — headline
  * convention, so the ratio is total); words = non-empty whitespace
  * tokens; syllables = per-word vowel-GROUP count with a 1-syllable
  * floor (`greatest(count, 1)` — 'rhythm'-class words), summed by a
  * bounded fold. The grade
  * `0.39·(words/sentences) + 11.8·(syllables/words) − 15.59` is float
  * only in the last expression — one shared text over exact-integer
  * ratios (CAST AS DOUBLE divisions, fixed decimal constants; §6's
  * determinism argument: same IEEE ops in the same order). Counts ship
  * alongside the grade so a different formula (SMOG, ARI) is a
  * downstream expression, not a new scan.
  *
  * Scale shape: pure fused map pass, zero exchanges before the output
  * sort — split, two regex counts, one `aggregate` fold per row (the
  * char_diversity plan class). NULL/empty text → 0/0/0 with grade NULL
  * (no sentences to grade — the one honest NULL; flagged docs filter on
  * counts, not the grade).
  */
object Readability {

  /** Per-word syllable floor-1 vowel-group count, summed. */
  private val syllExpr: String =
    """aggregate(filter(w, t -> t <> ''), 0L,
      |  (acc, t) -> acc + greatest(CAST(size(regexp_extract_all(t, '[aeiouy]+', 0)) AS BIGINT), 1L))""".stripMargin

  def readability(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"),
        expr("coalesce(split(lower(trim(text)), '[.!?]+'), array())").as("sg"))
      .withColumn("n_words", expr("CAST(size(filter(w, t -> t <> '')) AS BIGINT)"))
      .withColumn("n_sentences",
        expr("greatest(CAST(size(filter(sg, s -> trim(s) <> '')) AS BIGINT), CASE WHEN n_words > 0 THEN 1L ELSE 0L END)"))
      .withColumn("n_syllables", expr(syllExpr))
      .withColumn("fk_grade", expr(
        """CASE WHEN n_words = 0 THEN NULL
          |     ELSE 0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
          |          + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59
          |END""".stripMargin))
      .drop("w", "sg")

  def readabilityQ(documents: DataFrame): DataFrame =
    readability(documents)
      .select(col("doc_id"), col("n_sentences"), col("n_words"),
        col("n_syllables"), r("fk_grade", 4))
      .orderBy("doc_id")

  val readabilitySql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w,
       |         COALESCE(string_split_regex(lower(trim(text)), '[.!?]+'), []) AS sg
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(w, t -> t <> '')) AS BIGINT) AS n_words,
       |         CAST(len(list_filter(sg, s -> trim(s) <> '')) AS BIGINT) AS n_sent_raw,
       |         CAST(list_sum(list_transform(list_filter(w, t -> t <> ''),
       |           t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1))) AS BIGINT) AS syl_raw
       |  FROM t
       |), c2 AS (
       |  SELECT doc_id, n_words,
       |         greatest(n_sent_raw, CASE WHEN n_words > 0 THEN 1 ELSE 0 END) AS n_sentences,
       |         COALESCE(syl_raw, 0) AS n_syllables
       |  FROM c
       |)
       |SELECT doc_id, n_sentences, n_words, n_syllables,
       |       ${rsql(
      """CASE WHEN n_words = 0 THEN NULL
        |     ELSE 0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
        |          + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words) - 15.59
        |END""".stripMargin.linesIterator.mkString(" "), 4, "fk_grade")}
       |FROM c2
       |ORDER BY doc_id""".stripMargin
}
