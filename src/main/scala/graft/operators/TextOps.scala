package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Text-analysis operators over the `documents` table (SURVEY.md §2.C
  * 22–27): per-document statistics, quality scoring, heuristic language ID,
  * token counting, fingerprinting, and exact dedup — the document-hygiene
  * stages a large-scale training-data pipeline runs before anything
  * expensive touches the corpus.
  *
  * Everything here is pure per-row column work (`functions._`, codegen'd,
  * no UDFs) plus one groupBy/window on the fingerprint for dedup — at
  * 100 TB these are a single map-side pass and one hash shuffle on a short
  * hex key.
  *
  * Oracle parity: all outputs are integers, strings, booleans, or a SINGLE
  * division of integer-derived values — no accumulation drift is possible,
  * so Spark and DuckDB agree bit-for-bit (rounding via Parity for the
  * ratio columns). Spark's regexp_replace replaces globally by default;
  * the DuckDB twin passes the 'g' flag explicitly.
  */
object TextOps {

  /** Stopword markers for quality scoring (word pool of the synthetic
    * corpus contains 'the' and 'a'; the rest are standard English). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is", "on")

  // ------------------------------------------------------------ text_stats

  /** Per-doc chars, whitespace tokens, word lengths, punct/digit/upper
    * ratios. */
  def textStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("n_chars_calc", length(col("text")))
      .withColumn("n_tokens", expr("size(split(trim(text), '\\\\s+'))"))
      .withColumn("alpha_len", expr("length(regexp_replace(text, '\\\\s+', ''))"))
      .withColumn("n_punct", expr("length(regexp_replace(text, '[a-zA-Z0-9\\\\s]', ''))"))
      .withColumn("n_digit", expr("length(regexp_replace(text, '[^0-9]', ''))"))
      .withColumn("n_upper", expr("length(regexp_replace(text, '[^A-Z]', ''))"))
      .withColumn("avg_word_len", expr("CAST(alpha_len AS DOUBLE) / n_tokens"))
      .withColumn("punct_ratio", expr("CAST(n_punct AS DOUBLE) / n_chars_calc"))
      .withColumn("digit_ratio", expr("CAST(n_digit AS DOUBLE) / n_chars_calc"))
      .withColumn("upper_ratio", expr("CAST(n_upper AS DOUBLE) / n_chars_calc"))

  def textStatsQ(documents: DataFrame): DataFrame =
    textStats(documents)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("n_tokens"), r("avg_word_len", 4), r("punct_ratio", 4),
        r("digit_ratio", 4), r("upper_ratio", 4))
      .orderBy("doc_id")

  val textStatsSql: String =
    s"""SELECT doc_id, lang, source, n_chars,
       |       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |       ${rsql("(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')))", 4, "avg_word_len")},
       |       ${rsql("(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text))", 4, "punct_ratio")},
       |       ${rsql("(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text))", 4, "digit_ratio")},
       |       ${rsql("(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / length(text))", 4, "upper_ratio")}
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- text_quality

  private val stopwordsIn = Stopwords.map(w => s"'$w'").mkString(", ")

  /** Shared DuckDB CTE text computing the composite quality score — ONE
    * definition interpolated into [[corpusFilterSql]],
    * `Curation.qualitySelectSql` and `Curation.corpusReportSql`, so the
    * three oracles cannot drift from each other (or from [[textQuality]]'s
    * weights) if [[Stopwords]] or the score formula changes. Emits CTEs
    * `q`/`q2`/`q3`; `q3` ends with (doc_id, carry…, quality_score). The
    * text embeds `|` margins for the callers' `stripMargin`. */
  private[graft] def qualityScoreCtes(carry: Seq[String]): String = {
    val cols = (Seq("doc_id") ++ carry).mkString(", ")
    s"""q AS (
       |  SELECT $cols,
       |         string_split_regex(lower(trim(text)), '\\s+') AS toks,
       |         length(regexp_replace(text, '\\s+', '', 'g')) AS alpha_len
       |  FROM documents
       |), q2 AS (
       |  SELECT $cols,
       |         CAST(len(list_filter(toks, t -> t IN ($stopwordsIn))) AS DOUBLE) / len(toks) AS stop_ratio,
       |         1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS repetition_ratio,
       |         CAST(alpha_len AS DOUBLE) / len(toks) AS mean_word_len
       |  FROM q
       |), q3 AS (
       |  SELECT $cols,
       |         0.4 * least(stop_ratio / 0.1, 1.0) + 0.3 * (1.0 - repetition_ratio) + 0.3 * least(mean_word_len / 5.0, 1.0) AS quality_score
       |  FROM q2
       |)"""
  }

  /** Stopword ratio, mean word length, repetition ratio → composite
    * quality score + keep flag (the usual pre-training corpus filter). */
  def textQuality(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", expr("split(lower(trim(text)), '\\\\s+')"))
      .withColumn("n_tokens", expr("size(toks)"))
      .withColumn("n_stop", expr(s"size(filter(toks, t -> t IN ($stopwordsIn)))"))
      .withColumn("n_distinct", expr("size(array_distinct(toks))"))
      .withColumn("alpha_len", expr("length(regexp_replace(text, '\\\\s+', ''))"))
      .withColumn("stop_ratio", expr("CAST(n_stop AS DOUBLE) / n_tokens"))
      .withColumn("repetition_ratio", expr("1.0 - CAST(n_distinct AS DOUBLE) / n_tokens"))
      .withColumn("mean_word_len", expr("CAST(alpha_len AS DOUBLE) / n_tokens"))
      .withColumn("quality_score", expr(
        "0.4 * least(stop_ratio / 0.1, 1.0) + 0.3 * (1.0 - repetition_ratio) + 0.3 * least(mean_word_len / 5.0, 1.0)"))
      .withColumn("keep", col("quality_score") >= 0.5)

  def textQualityQ(documents: DataFrame): DataFrame =
    textQuality(documents)
      .select(col("doc_id"), col("n_tokens"), col("n_stop"), col("n_distinct"),
        r("stop_ratio", 4), r("repetition_ratio", 4), r("mean_word_len", 4),
        r("quality_score", 4), col("keep"))
      .orderBy("doc_id")

  val textQualitySql: String =
    s"""WITH q AS (
       |  SELECT doc_id,
       |         string_split_regex(lower(trim(text)), '\\s+') AS toks,
       |         length(regexp_replace(text, '\\s+', '', 'g')) AS alpha_len
       |  FROM documents
       |), q2 AS (
       |  SELECT doc_id,
       |         len(toks) AS n_tokens,
       |         len(list_filter(toks, t -> t IN ($stopwordsIn))) AS n_stop,
       |         len(list_distinct(toks)) AS n_distinct,
       |         alpha_len
       |  FROM q
       |), q3 AS (
       |  SELECT *,
       |         CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       |         1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS repetition_ratio,
       |         CAST(alpha_len AS DOUBLE) / n_tokens AS mean_word_len
       |  FROM q2
       |), q4 AS (
       |  SELECT *,
       |         0.4 * least(stop_ratio / 0.1, 1.0) + 0.3 * (1.0 - repetition_ratio) + 0.3 * least(mean_word_len / 5.0, 1.0) AS quality_score
       |  FROM q3
       |)
       |SELECT doc_id, n_tokens, n_stop, n_distinct,
       |       ${rsql("stop_ratio", 4, "stop_ratio")},
       |       ${rsql("repetition_ratio", 4, "repetition_ratio")},
       |       ${rsql("mean_word_len", 4, "mean_word_len")},
       |       ${rsql("quality_score", 4, "quality_score")},
       |       quality_score >= 0.5 AS keep
       |FROM q4
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- lang_id

  /** Per-language marker words for the stopword-hit heuristic classifier.
    * Scores are LIKE-style hit counts; argmax with a fixed tie-break order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of ", " and "),
    "de" -> Seq(" der ", " die ", " und ", " nicht "),
    "es" -> Seq(" el ", " los ", " una ", " que "),
    "fr" -> Seq(" le ", " les ", " des ", " est "))

  private[graft] def scoreExpr(markers: Seq[String]): String =
    markers.map(m => s"(CASE WHEN contains(text, '$m') THEN 1 ELSE 0 END)").mkString(" + ")

  private[graft] val predExpr: String = {
    val langs = LangMarkers.map(_._1)
    val ges = langs.map { l =>
      val others = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN s_$l > 0 AND $others THEN '$l'"
    }.mkString(" ")
    s"CASE $ges ELSE 'unknown' END"
  }

  /** Heuristic classifier vs the labeled `lang` column. (The synthetic
    * corpus draws every language from one shared English-ish word pool, so
    * accuracy is what it is — the operator contract is the deterministic
    * classification, which the oracle checks.) */
  def langId(documents: DataFrame): DataFrame = {
    val scored = LangMarkers.foldLeft(documents) { case (df, (l, ms)) =>
      df.withColumn(s"s_$l", expr(scoreExpr(ms)))
    }
    scored.withColumn("pred_lang", expr(predExpr))
      .withColumn("is_match", col("pred_lang") === col("lang"))
  }

  def langIdQ(documents: DataFrame): DataFrame =
    langId(documents)
      .select((Seq(col("doc_id"), col("lang")) ++
        LangMarkers.map { case (l, _) => col(s"s_$l") } ++
        Seq(col("pred_lang"), col("is_match"))): _*)
      .orderBy("doc_id")

  val langIdSql: String = {
    val scores = LangMarkers
      .map { case (l, ms) => s"${scoreExpr(ms)} AS s_$l" }.mkString(",\n         ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang, text,
       |         $scores
       |  FROM documents
       |)
       |SELECT doc_id, lang, ${LangMarkers.map(m => "s_" + m._1).mkString(", ")},
       |       $predExpr AS pred_lang,
       |       ($predExpr) = lang AS is_match
       |FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------- token_count

  /** Whitespace tokens + a BPE-ish regex segmentation (letter runs, digit
    * runs, single punctuation marks — the classic pre-tokenizer shape). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def tokenCount(documents: DataFrame): DataFrame =
    documents
      .withColumn("ws_tokens", expr("size(split(trim(text), '\\\\s+'))"))
      .withColumn("bpe_tokens", expr(s"size(regexp_extract_all(text, '${BpePattern.replace("\\", "\\\\")}', 0))"))
      .withColumn("chars_per_token", expr("CAST(length(text) AS DOUBLE) / bpe_tokens"))

  def tokenCountQ(documents: DataFrame): DataFrame =
    tokenCount(documents)
      .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"),
        r("chars_per_token", 4))
      .orderBy("doc_id")

  val tokenCountSql: String =
    s"""SELECT doc_id,
       |       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       |       len(regexp_extract_all(text, '$BpePattern')) AS bpe_tokens,
       |       ${rsql(s"(CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '$BpePattern')))", 4, "chars_per_token")}
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- doc_fingerprint

  /** md5 of whitespace-normalized lowercase text + per-fingerprint
    * canonical doc (min doc_id). */
  def docFingerprint(documents: DataFrame): DataFrame = {
    val wFp = Window.partitionBy("fingerprint")
    documents
      .withColumn("fingerprint",
        expr("md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))"))
      .withColumn("canonical_id", min("doc_id").over(wFp))
  }

  def docFingerprintQ(documents: DataFrame): DataFrame =
    docFingerprint(documents)
      .select(col("doc_id"), col("fingerprint"), col("canonical_id"))
      .orderBy("doc_id")

  val docFingerprintSql: String =
    s"""SELECT doc_id,
       |       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
       |       min(doc_id) OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS canonical_id
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------------- dedup_exact

  /** Exact dedup: doc → canonical id via fingerprint groupBy; is_dup marks
    * non-canonical members. The scale shape is one hash shuffle on the
    * 32-hex fingerprint (map-side combinable min). */
  def dedupExact(documents: DataFrame): DataFrame =
    docFingerprint(documents)
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "canonical_id", "is_dup")

  def dedupExactQ(documents: DataFrame): DataFrame =
    dedupExact(documents).orderBy("doc_id")

  val dedupExactSql: String =
    s"""WITH fp AS (
       |  SELECT doc_id,
       |         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
       |  FROM documents
       |)
       |SELECT doc_id,
       |       min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
       |       doc_id <> min(doc_id) OVER (PARTITION BY fingerprint) AS is_dup
       |FROM fp
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- corpus_filter

  /** The composed ADMISSION decision a training-data pipeline actually
    * ships: per document, quality gate ([[textQuality]]'s keep), language
    * gate ([[langId]]'s classifier produced a language at all), and
    * exact-dedup canonical gate ([[docFingerprint]]'s min-id member) — one
    * boolean verdict plus the per-gate reasons, so rejected docs are
    * attributable.
    *
    * Plan shape: every gate but dedup is per-row column work fused into ONE
    * map pass; the dedup gate adds the single hash shuffle on the 32-hex
    * fingerprint (window min). At 100 TB this is exactly the dedup_exact
    * cost — the quality/language scoring rides the same scan for free. */
  def corpusFilter(documents: DataFrame): DataFrame =
    docFingerprint(langId(textQuality(documents)))
      .withColumn("keep_quality", col("keep"))
      .withColumn("keep_lang", col("pred_lang") =!= lit("unknown"))
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
      .withColumn("admitted",
        col("keep_quality") && col("keep_lang") && col("is_canonical"))

  def corpusFilterQ(documents: DataFrame): DataFrame =
    corpusFilter(documents)
      .select(col("doc_id"), r("quality_score", 4), col("keep_quality"),
        col("pred_lang"), col("keep_lang"), col("canonical_id"),
        col("is_canonical"), col("admitted"))
      .orderBy("doc_id")

  val corpusFilterSql: String =
    s"""WITH ${qualityScoreCtes(Seq("text"))}, scored AS (
       |  SELECT doc_id, text, quality_score,
       |         ${LangMarkers.map { case (l, ms) => s"${scoreExpr(ms)} AS s_$l" }.mkString(",\n       |         ")}
       |  FROM q3
       |), lp AS (
       |  SELECT doc_id, quality_score,
       |         $predExpr AS pred_lang,
       |         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
       |  FROM scored
       |), fp AS (
       |  SELECT doc_id, quality_score, pred_lang,
       |         min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id
       |  FROM lp
       |)
       |SELECT doc_id, ${rsql("quality_score", 4, "quality_score")},
       |       quality_score >= 0.5 AS keep_quality,
       |       pred_lang,
       |       pred_lang <> 'unknown' AS keep_lang,
       |       canonical_id,
       |       doc_id = canonical_id AS is_canonical,
       |       (quality_score >= 0.5 AND pred_lang <> 'unknown' AND doc_id = canonical_id) AS admitted
       |FROM fp
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- corpus_split

  /** Leakage-safe deterministic train/val/test split — the assignment a
    * training pipeline makes before anything touches a model. Keyed on the
    * exact-dedup FINGERPRINT, not doc_id: byte-identical documents always
    * land in the same split, so an exact duplicate can never straddle
    * train/test (the classic eval-contamination bug). The split hash is
    * md5 over a salted fingerprint — content-stable (re-ingesting the
    * same corpus reproduces the split; adding docs never moves existing
    * ones), uniform, and cross-engine exact: md5 hex is identical in
    * Spark and DuckDB, and fixed-width lowercase hex compares
    * lexicographically = numerically, so the 80/10/10 thresholds are hex
    * string literals (cccc₁₆ = 52428 ≈ .8·65536, e666₁₆ = 58982 ≈ .9·65536)
    * with no integer conversion to drift between engines.
    *
    * Scale shape: pure fused map pass — two md5s and a substring compare
    * per row, ZERO exchanges (spec-pinned). */
  def corpusSplit(documents: DataFrame): DataFrame =
    documents
      .withColumn("fingerprint",
        expr("md5(lower(trim(regexp_replace(text, '\\\\s+', ' '))))"))
      .withColumn("bucket",
        expr("substring(md5(concat('graft-split:', fingerprint)), 1, 4)"))
      .withColumn("split",
        when(col("bucket") < lit("cccc"), lit("train"))
          .when(col("bucket") < lit("e666"), lit("val"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("fingerprint"), col("split"))

  def corpusSplitQ(documents: DataFrame): DataFrame =
    corpusSplit(documents).orderBy("doc_id")

  /** Shared CTE body producing `sp(doc_id, fingerprint, split)` — the
    * split assignment. One text for [[corpusSplitSql]] and every oracle
    * that composes on the assignment (split_leakage), so the split rule
    * cannot drift between consumers. */
  private[operators] val corpusSplitBodySql: String =
    s"""spfp AS (
       |  SELECT doc_id,
       |         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
       |  FROM documents
       |), spb AS (
       |  SELECT doc_id, fingerprint,
       |         substring(md5('graft-split:' || fingerprint), 1, 4) AS bucket
       |  FROM spfp
       |), sp AS (
       |  SELECT doc_id, fingerprint,
       |         CASE WHEN bucket < 'cccc' THEN 'train'
       |              WHEN bucket < 'e666' THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM spb
       |)""".stripMargin

  val corpusSplitSql: String =
    s"""WITH $corpusSplitBodySql
       |SELECT doc_id, fingerprint, split
       |FROM sp
       |ORDER BY doc_id""".stripMargin
}
