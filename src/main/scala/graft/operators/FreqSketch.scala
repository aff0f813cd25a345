package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SAMPLED FREQUENT-ITEMS SKETCH (round 10) — the heavy-hitters member
  * of the sketch family, completing the trio: [[ThetaDiff]] (distinct-set
  * algebra), [[QuantileSketch]] (quantiles), and now term frequency. The
  * exact top-terms contract is [[Vocab]]/[[Curation.tfidfTopTerms]]; at
  * 100 TB their (source, term) aggregation carries the FULL vocabulary
  * through the exchange, and the sketch family's escape applies verbatim:
  * a deterministic θ sample of DOCUMENTS (the fp-hex construction — doc
  * sampled iff `substring(fp, 1, 1) < '$SampleHexBound'`, p = bound/16
  * exactly) with EXACT document-frequency counts inside the sample.
  * Engine-neutral ⇒ both engines draw the identical sample and the
  * sketch is sql-oracled — a Misra-Gries / SpaceSaving summary never can
  * be (its contents depend on arrival order).
  *
  * Sampling KEY: the doc's IDENTITY hash (`md5(doc_id)`), deliberately
  * NOT the content fingerprint the distinct-set family keys on. For set
  * algebra, content-keying is the point (duplicate content must collapse
  * to one sample decision); for OCCURRENCE statistics it is a trap —
  * duplicate texts would sample together-or-not, correlating the draws
  * and inflating per-term variance beyond Binomial (measured on the
  * gate corpus, whose planted duplicate clusters broke the 3σ band under
  * content-keying). Identity-keying makes each doc an independent
  * Bernoulli(p), so sampled_df is exactly Binomial(df, p).
  *
  * Estimator: sampled_df ~ Binomial(df, p) per FIXED term, so `df_est =
  * sampled_df · 16 div bound` is unbiased with σ = √(df·p(1−p)) — but
  * the REPORTED set is the top-K by sampled count, and conditioning on
  * selection biases near-boundary estimates upward (the same caveat
  * SpaceSaving documents; measured at gate: 6 of 200 reported terms
  * beyond 3σ, all high). FreqSketchSpec therefore pins the binomial band
  * UNCONDITIONALLY — on the exact top-K per source, whose selection is
  * sample-independent — plus the doc-granular MERGE-BY-UNION identity
  * (disjoint shards sketch independently and their sampled counts ADD —
  * fixed θ, the ThetaDiff property) and a planted-heavy-hitter
  * rank/recall check.
  *
  * Scale shape: the sampling predicate is map-side (kills 1−p of the
  * corpus before tokenization), the explode is inline at the Generate
  * (the repo invariant), the (source, term) aggregation is map-side
  * combinable over the sample, and the per-source top-K window runs on
  * the vocab-bounded count frame. Doc frequency (0/1 per doc) rather
  * than occurrence counts keeps the estimator binomial — and df is the
  * quantity the curation consumers (stopword gates, idf, vocab pruning)
  * actually read.
  */
object FreqSketch {

  /** fp-hex sampling bound: p = bound/16 (= 1/2 at gate scale — gate
    * sources are tens of docs; a 100 TB deployment narrows p until the
    * sampled corpus fits the exchange comfortably). 16 div bound is
    * integer so the scaled estimate stays exact. */
  val SampleHexBound = 8

  /** Reported heavy hitters per source. */
  val TopK = 10

  /** Identity-keyed sampling hash (see scaladoc — NOT the content fp). */
  private[graft] val idHashExpr = "md5(CAST(doc_id AS STRING))"

  def freqSketch(documents: DataFrame): DataFrame = {
    val terms = documents
      .select(col("source"), col("text"), expr(idHashExpr).as("fp"))
      .filter(expr(s"substring(fp, 1, 1) < '$SampleHexBound'"))
      // distinct terms PER DOC (df semantics); array expression inline at
      // the generator per the InferFiltersFromGenerate invariant
      .select(col("source"),
        explode(expr("array_distinct(split(lower(trim(text)), '\\\\s+'))")).as("term"))
    val byDf = Window.partitionBy("source")
      .orderBy(col("sampled_df").desc, col("term"))
    terms.groupBy("source", "term").agg(count(lit(1)).as("sampled_df"))
      .withColumn("rank", row_number().over(byDf))
      .filter(col("rank") <= TopK)
      .withColumn("df_est", expr(s"sampled_df * (16 div $SampleHexBound)"))
      .select(col("source"), col("rank").cast("int").as("rank"),
        col("term"), col("sampled_df"), col("df_est"))
  }

  def freqSketchQ(documents: DataFrame): DataFrame =
    freqSketch(documents).orderBy("source", "rank")

  /** DuckDB twin: identical sample, identical df counting and ranking. */
  val freqSketchSql: String =
    s"""WITH t AS (
       |  SELECT source, text,
       |         md5(CAST(doc_id AS VARCHAR)) AS fp
       |  FROM documents
       |), terms AS (
       |  SELECT source,
       |         unnest(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS term
       |  FROM t WHERE substring(fp, 1, 1) < '$SampleHexBound'
       |), cnt AS (
       |  SELECT source, term, count(*) AS sampled_df
       |  FROM terms GROUP BY source, term
       |), ranked AS (
       |  SELECT source, term, sampled_df,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY sampled_df DESC, term) AS rank
       |  FROM cnt
       |)
       |SELECT source, CAST(rank AS INT) AS rank, term,
       |       CAST(sampled_df AS BIGINT) AS sampled_df,
       |       CAST(sampled_df * (16 // $SampleHexBound) AS BIGINT) AS df_est
       |FROM ranked
       |WHERE rank <= $TopK
       |ORDER BY source, rank""".stripMargin
}
