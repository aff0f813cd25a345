package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** LEXICON scoring (round 8, continuation) — the wordlist-gate CLASS:
  * C4's badwords blocklist, toxicity lists, edu-value lists and sentiment
  * lexicons are all the same mechanism — membership counts of the token
  * stream against small curated word sets, a ratio, and a gate. The
  * suite's other blocklists work at URL ([[UrlFilter]]) and line
  * ([[LineFilter]]) granularity; this is the WORD-granularity member,
  * instantiated with a polarity (±) lexicon: positive/negative hit
  * counts, net polarity in exact per-mille, and a flag for docs whose
  * negative mass dominates (the badwords-gate shape: C4 drops the doc;
  * this reports, policy gates downstream).
  *
  * §6: hit counts are exact integers (IN-list membership, the
  * [[TextOps.Stopwords]] mechanism), polarity_pm =
  * `((n_pos − n_neg) · 1000) div n_tokens` is integer arithmetic —
  * NEGATIVE-safe note: Spark `div` truncates while DuckDB `//` floors,
  * and n_pos − n_neg CAN be negative, so the division must NOT be a
  * floor/trunc mismatch — both engines here divide a possibly-negative
  * numerator by a positive denominator, so the quotient is computed as
  * `sign · (|num| div den)` in ONE shared text (truncation semantics,
  * engine-identical by construction) rather than a bare `div`/`//`.
  * The displayed ratio is one Parity cast-divide.
  *
  * Scale shape: pure fused map pass, zero exchanges before the output
  * sort (the text_quality plan class); lexicons are compile-time IN
  * lists (codegen'd membership, no join, no broadcast). Swapping in a
  * real 400-word production list changes the constant, not the shape.
  */
object Lexicon {

  /** Positive/negative lexicons — small curated instances of the class
    * (real deployments drop in their own lists; the gate corpus's
    * vocabulary makes 'fast'/'slow' the live pair locally). */
  val Positive: Seq[String] = Seq(
    "good", "great", "excellent", "fast", "clean", "clear", "correct",
    "stable", "simple", "robust", "efficient", "reliable")
  val Negative: Seq[String] = Seq(
    "bad", "poor", "terrible", "slow", "dirty", "broken", "wrong",
    "unstable", "complex", "fragile", "inefficient", "unreliable")

  /** polarity_pm below which a doc is flagged negative-dominated. */
  val NegativePm = -50L

  private def inList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString(", ")

  /** Truncating signed division in one engine-shared text: Spark `div`
    * truncates, DuckDB `//` floors — they differ exactly on negative
    * quotients, so the sign is factored out before the division. */
  private def truncDiv(num: String, den: String): String =
    s"(CASE WHEN ($num) < 0 THEN -1 ELSE 1 END) * (abs($num) div greatest($den, 1))"

  private def truncDivSql(num: String, den: String): String =
    s"(CASE WHEN ($num) < 0 THEN -1 ELSE 1 END) * (abs($num) // greatest($den, 1))"

  def lexiconScore(documents: DataFrame,
                   positive: Seq[String] = Positive,
                   negative: Seq[String] = Negative,
                   negativePm: Long = NegativePm): DataFrame =
    documents
      .select(col("doc_id"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))
      .withColumn("n_tokens", expr("CAST(size(filter(w, t -> t <> '')) AS BIGINT)"))
      .withColumn("n_pos",
        expr(s"CAST(size(filter(w, t -> t IN (${inList(positive)}))) AS BIGINT)"))
      .withColumn("n_neg",
        expr(s"CAST(size(filter(w, t -> t IN (${inList(negative)}))) AS BIGINT)"))
      .withColumn("polarity_pm",
        expr(truncDiv("(n_pos - n_neg) * 1000", "n_tokens")))
      .withColumn("is_negative", expr(s"polarity_pm < $negativePm"))
      .drop("w")

  def lexiconScoreQ(documents: DataFrame): DataFrame =
    lexiconScore(documents)
      .select(col("doc_id"), col("n_tokens"), col("n_pos"), col("n_neg"),
        col("polarity_pm"), col("is_negative"))
      .orderBy("doc_id")

  val lexiconScoreSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(w, t -> t <> '')) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(w, t -> t IN (${inList(Positive)}))) AS BIGINT) AS n_pos,
       |         CAST(len(list_filter(w, t -> t IN (${inList(Negative)}))) AS BIGINT) AS n_neg
       |  FROM t
       |)
       |SELECT doc_id, n_tokens, n_pos, n_neg,
       |       ${truncDivSql("(n_pos - n_neg) * 1000", "n_tokens")} AS polarity_pm,
       |       ${truncDivSql("(n_pos - n_neg) * 1000", "n_tokens")} < $NegativePm AS is_negative
       |FROM c
       |ORDER BY doc_id""".stripMargin
}
