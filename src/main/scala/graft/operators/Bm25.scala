package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** BM25 RANKED RETRIEVAL (round 10) — [[KeywordSearch]] ships plain
  * tf·idf; BM25 (Robertson–Spärck Jones, the public Okapi formula) adds
  * the two effects that make rankings usable on real corpora: TF
  * SATURATION (the k1 dial — the 40th occurrence of a term is worth
  * almost nothing over the 39th) and LENGTH NORMALIZATION (the b dial —
  * a hit in a short doc outranks the same hit buried in a long one).
  *
  * All-integer quantization (§6 — no ln, no float sums):
  *  - idf: the ±0.5-smoothed ratio with halves cleared by doubling —
  *    `idf_w = ((2N − 2df + 1) · IdfScale) div (2df + 1)`.
  *  - k1, b in milli-units (K1M = 1200, BM = 750); relative doc length
  *    `Lr = (dl · 1000) div avgdl` with `avgdl = Σdl div N`.
  *  - per-term contribution with ONE final floor division (numerator
  *    and denominator cross-multiplied so no nested rounding):
  *    `(idf_w · tf · (K1M+1000) · 1000) div (tf·10⁶ + K1M·(1000 − BM + (BM·Lr) div 1000))`.
  *    Positive operands throughout, so Spark `div` == DuckDB `//`
  *    (the shared formula text is swapped mechanically — one source of
  *    truth, no hand-mirroring drift).
  *  - int64 headroom: idf_w ≤ N·IdfScale, contribution numerator
  *    ≤ N·10³·tf·2.2·10⁶ — safe past 10⁹ docs at IdfScale 10³ with
  *    tf ≤ 10⁴ (a 100 TB deployment narrows IdfScale before overflow).
  *
  * Scale shape ([[KeywordSearch]]'s, plus one map-side length pass):
  * query-term hits filtered INSIDE the token array before the inline
  * explode (|Q|-bounded stream); tf checkpointed (two consumers);
  * lengths are a doc-keyed map-side pass (the qualitySelect two-pass
  * trade — no corpus materialization); df/avgdl are |Q|-row / 1-row
  * broadcast facts; top-K via TakeOrderedAndProject; provenance joined
  * AFTER the cut.
  */
object Bm25 {

  val IdfScale = 1000L
  val K1M = 1200L // k1 = 1.2
  val BM = 750L   // b = 0.75
  val TopK = 50

  private def termsIn = KeywordSearch.QueryTerms.map(t => s"'$t'").mkString(", ")

  /** The one shared contribution formula (Spark dialect; positive
    * operands). `swapDiv` derives the DuckDB text. */
  private def contribExpr(k1m: Long, bm: Long): String =
    s"(idf_w * tf * ($k1m + 1000) * 1000) div " +
      s"(tf * 1000000 + $k1m * (1000 - $bm + ($bm * lr) div 1000))"

  private def swapDiv(s: String): String = s.replace(" div ", " // ")

  def bm25Rank(documents: DataFrame, k: Int = TopK,
               k1m: Long = K1M, bm: Long = BM): DataFrame = {
    val hits = documents
      .select(col("doc_id"),
        explode(expr(
          s"filter(coalesce(split(lower(trim(text)), '\\\\s+'), array()), t -> t IN ($termsIn))"))
          .as("term"))
    val tf = hits.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // df derivation + scoring join (multi-consumer)
    val lengths = documents.select(col("doc_id"),
      expr("CAST(size(coalesce(split(lower(trim(text)), '\\\\s+'), array())) AS BIGINT)").as("dl"))
    val corpus = lengths.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
      .withColumn("avgdl", expr("greatest(tot_dl div greatest(n_docs, 1), 1)"))
    val weights = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(corpus.select("n_docs")))
      .withColumn("idf_w",
        expr(s"((2 * n_docs - 2 * df + 1) * $IdfScale) div (2 * df + 1)"))
    val scored = tf
      .join(weights.select("term", "idf_w"), Seq("term"))
      .join(lengths, Seq("doc_id"))
      .crossJoin(broadcast(corpus.select("avgdl")))
      .withColumn("lr", expr("(dl * 1000) div avgdl"))
      .withColumn("contrib", expr(contribExpr(k1m, bm)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("contrib").as("score_i"))
      .orderBy(col("score_i").desc, col("doc_id"))
      .limit(k)
    scored
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_i").desc, col("doc_id"))))
      .join(documents.select("doc_id", "lang", "source"), Seq("doc_id"))
      .select(col("rank"), col("doc_id"), col("lang"), col("source"),
        col("n_terms"), col("score_i"),
        r(s"(CAST(score_i AS DOUBLE) / CAST(1000000 AS DOUBLE))", 6).as("score"))
  }

  def bm25RankQ(documents: DataFrame): DataFrame =
    bm25Rank(documents).orderBy("rank")

  /** DuckDB twin — the identical integer formula with `div` swapped to
    * `//` mechanically. */
  val bm25RankSql: String =
    s"""WITH hits AS (
       |  SELECT doc_id,
       |         unnest(list_filter(COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []),
       |                            t -> t IN ($termsIn))) AS term
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM hits GROUP BY 1, 2
       |), lengths AS (
       |  SELECT doc_id,
       |         CAST(len(COALESCE(string_split_regex(lower(trim(text)), '\\s+'), [])) AS BIGINT) AS dl
       |  FROM documents
       |), corpus AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         greatest(CAST(COALESCE(sum(dl), 0) AS BIGINT) // greatest(CAST(count(*) AS BIGINT), 1), 1) AS avgdl
       |  FROM lengths
       |), weights AS (
       |  SELECT term,
       |         ((2 * n_docs - 2 * CAST(count(*) AS BIGINT) + 1) * $IdfScale) // (2 * CAST(count(*) AS BIGINT) + 1) AS idf_w
       |  FROM tf CROSS JOIN corpus GROUP BY term, n_docs
       |), scored AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |         CAST(sum(${swapDiv(contribExpr(K1M, BM))}) AS BIGINT) AS score_i
       |  FROM (
       |    SELECT tf.doc_id, tf.tf, w.idf_w, (l.dl * 1000) // c.avgdl AS lr
       |    FROM tf
       |    JOIN weights w USING (term)
       |    JOIN lengths l ON l.doc_id = tf.doc_id
       |    CROSS JOIN corpus c
       |  )
       |  GROUP BY 1
       |  ORDER BY score_i DESC, doc_id LIMIT $TopK
       |)
       |SELECT CAST(row_number() OVER (ORDER BY score_i DESC, s.doc_id) AS INT) AS rank,
       |       s.doc_id, d.lang, d.source, n_terms, score_i,
       |       ${rsql("(CAST(score_i AS DOUBLE) / CAST(1000000 AS DOUBLE))", 6, "score")}
       |FROM scored s JOIN documents d ON s.doc_id = d.doc_id
       |ORDER BY rank""".stripMargin
}
