package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source DISTRIBUTION DIVERGENCE (round 8, continuation) — the
  * mixture-design diagnostic: how far each source's unigram distribution
  * sits from the corpus-wide distribution, as an exact total-variation
  * distance in integer ppm, plus the single most divergent term per
  * source. [[SourceOverlap]] answers "how much do sources SHARE";
  * this answers "how DIFFERENT is each source's language" — the number a
  * mixture designer reads before deciding whether upweighting src7 shifts
  * the training distribution (and [[VocabDrift]]'s cross-version sibling,
  * applied across the source axis instead of the time axis).
  *
  * Cross-engine exactness (§6): per-cell frequencies are integer ppm
  * (`c · 10⁶ div n`, nonnegative BIGINTs ⇒ floor == trunc identical);
  * TV = `Σ|ppm_s − ppm_g| div 2` stays in BIGINT (|vocab| · 10⁶ ≪ 2⁶³);
  * the top-term pick is a row_number with the total (gap DESC, term ASC)
  * key. No float anywhere. TV is computed over ppm-QUANTIZED
  * distributions — exact on those integers by construction, and the
  * quantization error vs real-valued TV is < |vocab| · 10⁻⁶ — the
  * scale-safe trade: per-cell values stay bounded regardless of corpus
  * size (no c·N cross products that overflow at 100 TB).
  *
  * Scale shape: one inline-exploded token stream into a (source, term)
  * count — checkpointed because THREE consumers read it (global vocab
  * rollup, per-source totals, the cell join) and Catalyst would otherwise
  * re-run the explode+agg per consumer (the tfidf tf-frame rule). The
  * cell grid is |vocab| × |sources| — catalog-bounded, built by a
  * broadcast nested loop whose build side is the catalog-sized source
  * list (the source_overlap precedent) — then one shuffle join back to
  * the counts and ONE source-keyed exchange that the rank window and the
  * final aggregation share (spec-pinned). Sources with zero tokens stay
  * total: they enter from the documents scan and read TV ≈ 500000.
  */
object SourceDivergence {

  private val tokExpr =
    "filter(split(lower(trim(coalesce(text, ''))), '\\\\s+'), t -> t <> '')"

  def sourceDivergence(documents: DataFrame): DataFrame = {
    val sc = documents
      .select(col("source"), explode(expr(tokExpr)).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("c_s"))
      .localCheckpoint()
    val vocabG = sc.groupBy("term").agg(sum("c_s").as("c_g"))
    val nTot = vocabG.agg(coalesce(sum("c_g"), lit(0L)).as("n_tot"))
    val vocab = vocabG.crossJoin(broadcast(nTot))
      .withColumn("ppm_g", expr("c_g * 1000000 div greatest(n_tot, 1)"))
    val perSrc = sc.groupBy("source").agg(sum("c_s").as("n_s"))
    val sources = documents.select("source").distinct()
      .join(perSrc, Seq("source"), "left")
      .withColumn("n_s", coalesce(col("n_s"), lit(0L)))
    val cells = vocab.crossJoin(broadcast(sources))
      .join(sc, Seq("source", "term"), "left")
      .withColumn("c_s", coalesce(col("c_s"), lit(0L)))
      .withColumn("ppm_s", expr("c_s * 1000000 div greatest(n_s, 1)"))
      .withColumn("gap", abs(col("ppm_s") - col("ppm_g")))
    val w = Window.partitionBy("source").orderBy(col("gap").desc, col("term"))
    cells
      .withColumn("rn", row_number().over(w))
      .groupBy("source")
      .agg(
        max("n_s").as("n_tokens"),
        sum(when(col("c_s") > 0, lit(1L)).otherwise(lit(0L))).as("n_terms"),
        expr("sum(gap) div 2").as("tv_ppm"),
        max(when(col("rn") === 1, col("term"))).as("top_term"),
        max(when(col("rn") === 1, col("gap"))).as("top_gap_ppm"))
      .orderBy("source")
  }

  def sourceDivergenceQ(documents: DataFrame): DataFrame =
    sourceDivergence(documents)

  val sourceDivergenceSql: String =
    """WITH toks AS (
      |  SELECT source,
      |         unnest(list_filter(string_split_regex(lower(trim(COALESCE(text, ''))), '\s+'), t -> t <> '')) AS term
      |  FROM documents
      |), sc AS (
      |  SELECT source, term, CAST(count(*) AS BIGINT) AS c_s FROM toks GROUP BY 1, 2
      |), vg AS (
      |  SELECT term, CAST(sum(c_s) AS BIGINT) AS c_g FROM sc GROUP BY 1
      |), tot AS (
      |  SELECT CAST(COALESCE(sum(c_g), 0) AS BIGINT) AS n_tot FROM vg
      |), ns AS (
      |  SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM sc GROUP BY 1
      |), srcs AS (
      |  SELECT d.source, COALESCE(ns.n_s, 0) AS n_s
      |  FROM (SELECT DISTINCT source FROM documents) d
      |  LEFT JOIN ns ON d.source = ns.source
      |), cells AS (
      |  SELECT s.source, v.term, s.n_s,
      |         COALESCE(sc.c_s, 0) AS c_s,
      |         COALESCE(sc.c_s, 0) * 1000000 // greatest(s.n_s, 1) AS ppm_s,
      |         v.c_g * 1000000 // greatest(t.n_tot, 1) AS ppm_g
      |  FROM vg v CROSS JOIN tot t CROSS JOIN srcs s
      |  LEFT JOIN sc ON sc.source = s.source AND sc.term = v.term
      |), g AS (
      |  SELECT source, term, n_s, c_s, abs(ppm_s - ppm_g) AS gap,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY abs(ppm_s - ppm_g) DESC, term) AS rn
      |  FROM cells
      |)
      |SELECT source,
      |       max(n_s) AS n_tokens,
      |       CAST(sum(CASE WHEN c_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
      |       CAST(sum(gap) AS BIGINT) // 2 AS tv_ppm,
      |       max(CASE WHEN rn = 1 THEN term END) AS top_term,
      |       max(CASE WHEN rn = 1 THEN gap END) AS top_gap_ppm
      |FROM g
      |GROUP BY source
      |ORDER BY source""".stripMargin
}
