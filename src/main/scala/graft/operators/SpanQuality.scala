package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document QUALITY LOCALIZATION (round 8, continuation) — WHERE a
  * document goes bad, not just that it does: score fixed token windows
  * against [[LmScore]]'s corpus-trained bigram model and surface each
  * doc's WORST window. A doc-level score hides a boilerplate block or
  * injected spam inside an otherwise-good document; the span verdict is
  * what makes surgical removal ([[DupSpans]]' class) possible for
  * QUALITY, the way [[ParagraphDedup]] already enables it for
  * duplication. Windows are fixed at [[WindowTokens]] tokens; pairs that
  * straddle a window boundary belong to neither (each window scores only
  * its internal bigrams — deterministic and engine-identical).
  *
  * §6: identical integer algebra to lm_score (`((c_xy+1)·10⁶) div
  * (c_x+V)` per pair; per-window sums are BIGINTs; the per-window
  * average is `sum div n` — integer, unlike the doc-level op's displayed
  * double, because it is a RANK KEY here); worst pick is a row_number
  * over the total (avg_ppm ASC, win_id ASC) key. Degenerate docs (no
  * internal pair anywhere) read (-1, 0, 0, 0) via the doc-spine left
  * join — total.
  *
  * Scale shape: the model is the same vocab²-bounded count table
  * (checkpointed in [[LmScore.model]]); the windowed pair stream is the
  * SAME volume as lm_score's (one posexplode of the inline pair-array
  * expression, with pos arithmetic deciding window membership — no
  * extra pass, no per-window re-tokenization); the rank window and the
  * n_windows count ride one doc_id exchange.
  */
object SpanQuality {

  /** Window width in tokens (W−1 internal bigrams per full window). */
  val WindowTokens = 16

  def spanQuality(documents: DataFrame): DataFrame = {
    val W = WindowTokens
    val (bc, cx, v) = LmScore.model(documents)
    val perWin = LmScore.toks(documents)
      .select(col("doc_id"), posexplode(expr(LmScore.pairArrayExpr)).as(Seq("i", "p")))
      .filter(expr(s"i % $W != ${W - 1}"))
      .select(col("doc_id"), expr(s"CAST(i AS BIGINT) div $W").as("win_id"),
        col("p.x").as("x"), col("p.y").as("y"))
      .join(bc, Seq("x", "y"), "left")
      .join(cx, Seq("x"), "left")
      .crossJoin(v)
      .withColumn("wgt",
        expr(s"((coalesce(c_xy, 0L) + 1L) * ${LmScore.Scale}) div (coalesce(c_x, 0L) + v)"))
      .groupBy("doc_id", "win_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("wgt").as("sum_w"))
      .withColumn("avg_ppm", expr("sum_w div greatest(n_bigrams, 1)"))
    val worst = perWin
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("avg_ppm"), col("win_id"))))
      .withColumn("n_windows", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("rn") === 1)
    documents.select("doc_id").join(worst, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("win_id"), lit(-1L)).as("worst_win"),
        coalesce(col("n_bigrams"), lit(0L)).as("worst_n_bigrams"),
        coalesce(col("avg_ppm"), lit(0L)).as("worst_avg_ppm"))
  }

  def spanQualityQ(documents: DataFrame): DataFrame =
    spanQuality(documents).orderBy("doc_id")

  val spanQualitySql: String = {
    val W = WindowTokens
    s"""WITH ${LmScore.lmModelCtes("TRUE")}, idx AS (
       |  SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks
       |), spr AS (
       |  SELECT doc_id, CAST((i - 1) // $W AS BIGINT) AS win_id,
       |         w[i] AS x, w[i + 1] AS y
       |  FROM idx WHERE (i - 1) % $W <> ${W - 1}
       |), sc AS (
       |  SELECT p.doc_id, p.win_id,
       |         ((COALESCE(bc.c_xy, 0) + 1) * ${LmScore.Scale}) // (COALESCE(cx.c_x, 0) + v.v) AS wgt
       |  FROM spr p
       |  LEFT JOIN bc ON bc.x = p.x AND bc.y = p.y
       |  LEFT JOIN cx ON cx.x = p.x
       |  CROSS JOIN vocab v
       |), wagg AS (
       |  SELECT doc_id, win_id,
       |         CAST(count(*) AS BIGINT) AS n_bigrams,
       |         CAST(sum(wgt) AS BIGINT) AS sum_w
       |  FROM sc GROUP BY 1, 2
       |), wk AS (
       |  SELECT doc_id, win_id, n_bigrams,
       |         sum_w // greatest(n_bigrams, 1) AS avg_ppm,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY sum_w // greatest(n_bigrams, 1), win_id) AS rn,
       |         CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_windows
       |  FROM wagg
       |)
       |SELECT d.doc_id,
       |       COALESCE(wk.n_windows, 0) AS n_windows,
       |       COALESCE(wk.win_id, -1) AS worst_win,
       |       COALESCE(wk.n_bigrams, 0) AS worst_n_bigrams,
       |       COALESCE(wk.avg_ppm, 0) AS worst_avg_ppm
       |FROM documents d
       |LEFT JOIN (SELECT * FROM wk WHERE rn = 1) wk ON wk.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}
