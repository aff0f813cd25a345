package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Window-granularity language COMPOSITION per document (round 8,
  * continuation) — the multilingual-document detector: [[TextOps.langId]]
  * classifies a document once, which silently mislabels documents that mix
  * languages (translated quotes, code-switching forums, parallel-text
  * pages). This operator runs the SAME marker classifier per fixed-token
  * window and rolls up the composition: per-language window counts, the
  * dominant language (argmax with the classifier's fixed tie-break order),
  * its fraction, and an `is_mixed` flag when no language reaches
  * [[DominantMin]] of the windows — the gate a monolingual training
  * mixture applies before trusting any whole-doc label.
  *
  * Windows are [[ParagraphDedup]]'s fixed [[ParagraphDedup.ParaWindowTokens]]-token
  * windows (same tokenization as every text operator); each window is
  * space-padded before scoring because the marker strings are
  * space-delimited (`' the '`) and must be able to hit the window's first
  * and last token. All counts are integers; the single division is the
  * dominant fraction (Parity-rounded).
  *
  * Degenerate convention (both engines): NULL text → zero windows →
  * counts 0, dominant 'none', fraction 0.0, is_mixed false (left join +
  * coalesce, the family's 0-hit convention).
  *
  * Scale shape: inline-generator window explode (Generate-child
  * discipline) → fused per-window scoring map → ONE doc-keyed aggregation
  * with map-side combine (≤ 1 row per doc out) → one doc-keyed left join
  * back to the doc spine. No pairwise work, no corpus-sized broadcast —
  * linear in total windows at any corpus size.
  *
  * Reference relation: extends §2.C 24 (`lang_id`, heuristic classifier)
  * to sub-document granularity; the reference has no language handling at
  * all (EEG signals).
  */
object LangMix {

  /** A document is MIXED when its dominant language holds fewer than this
    * fraction of its windows. */
  val DominantMin = 0.8

  private val langs: Seq[String] = TextOps.LangMarkers.map(_._1) :+ "unknown"

  /** First language (classifier tie-break order, 'unknown' last) whose
    * window count is ≥ every other's — CASE text shared by both engines. */
  private val dominantExpr: String = {
    val whens = langs.map { l =>
      val geAll = langs.filter(_ != l).map(o => s"c_$l >= c_$o").mkString(" AND ")
      s"WHEN $geAll THEN '$l'"
    }.mkString(" ")
    s"CASE $whens ELSE 'none' END"
  }

  private val greatestCnt: String = s"greatest(${langs.map("c_" + _).mkString(", ")})"

  /** Per-doc language composition over fixed-token windows. */
  def langMix(documents: DataFrame,
              width: Int = ParagraphDedup.ParaWindowTokens,
              dominantMin: Double = DominantMin): DataFrame = {
    val windows = documents
      .select(col("doc_id"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))
      .select(col("doc_id"),
        explode(expr(ParagraphDedup.paraArrayExpr(width))).as("passage"))
      // pad so the space-delimited markers can match at window edges
      .select(col("doc_id"), concat(lit(" "), col("passage"), lit(" ")).as("text"))
    val scored = TextOps.LangMarkers.foldLeft(windows) { case (df, (l, ms)) =>
      df.withColumn(s"s_$l", expr(TextOps.scoreExpr(ms)))
    }.withColumn("pred", expr(TextOps.predExpr))
    val aggCols = count(lit(1)).as("nw") +:
      langs.map(l => sum(when(col("pred") === l, 1L).otherwise(0L)).as(s"cc_$l"))
    val agg = scored.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*)
    documents.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .withColumn("n_windows", coalesce(col("nw"), lit(0L)))
      .withColumns(langs.map(l => s"c_$l" -> coalesce(col(s"cc_$l"), lit(0L))).toMap)
      .withColumn("dominant_lang",
        when(col("n_windows") === 0, lit("none")).otherwise(expr(dominantExpr)))
      .withColumn("dominant_frac",
        expr(s"CAST($greatestCnt AS DOUBLE) / greatest(n_windows, 1)"))
      .withColumn("is_mixed",
        col("n_windows") > 0 && col("dominant_frac") < dominantMin)
      .select((Seq(col("doc_id"), col("n_windows")) ++
        langs.map(l => col(s"c_$l")) ++
        Seq(col("dominant_lang"), col("dominant_frac"), col("is_mixed"))): _*)
  }

  def langMixQ(documents: DataFrame): DataFrame =
    langMix(documents)
      .select((Seq(col("doc_id"), col("n_windows")) ++
        langs.map(l => col(s"c_$l")) ++
        Seq(col("dominant_lang"), r("dominant_frac", 4), col("is_mixed"))): _*)
      .orderBy("doc_id")

  /** DuckDB twin: same window comprehension as [[ParagraphDedup]]'s
    * oracles, same padded marker scoring, same argmax CASE. */
  val langMixSql: String = {
    val wdt = ParagraphDedup.ParaWindowTokens
    val scores = TextOps.LangMarkers
      .map { case (l, ms) => s"${TextOps.scoreExpr(ms)} AS s_$l" }
      .mkString(",\n       |         ")
    val cnts = langs
      .map(l => s"CAST(sum(CASE WHEN pred = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS cc_$l")
      .mkString(",\n       |         ")
    val carry = langs.map(l => s"COALESCE(cc_$l, 0) AS c_$l").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents
       |), g AS (
       |  SELECT doc_id,
       |         [array_to_string(w[s*$wdt+1 : s*$wdt+$wdt], ' ')
       |          for s in range(0, CAST(ceil(len(w) / $wdt.0) AS BIGINT))] AS paras
       |  FROM toks
       |), ex AS (
       |  SELECT doc_id, ' ' || unnest(paras) || ' ' AS text FROM g
       |), sc AS (
       |  SELECT doc_id,
       |         $scores
       |  FROM ex
       |), p AS (
       |  SELECT doc_id, ${TextOps.predExpr} AS pred FROM sc
       |), a AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
       |         $cnts
       |  FROM p GROUP BY 1
       |), j AS (
       |  SELECT d.doc_id, COALESCE(nw, 0) AS n_windows, $carry
       |  FROM documents d LEFT JOIN a ON a.doc_id = d.doc_id
       |)
       |SELECT doc_id, n_windows, ${langs.map("c_" + _).mkString(", ")},
       |       CASE WHEN n_windows = 0 THEN 'none' ELSE $dominantExpr END AS dominant_lang,
       |       ${rsql(s"CAST($greatestCnt AS DOUBLE) / greatest(n_windows, 1)", 4, "dominant_frac")},
       |       (n_windows > 0 AND CAST($greatestCnt AS DOUBLE) / greatest(n_windows, 1) < $DominantMin) AS is_mixed
       |FROM j
       |ORDER BY doc_id""".stripMargin
  }
}
