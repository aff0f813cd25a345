package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Language-model likelihood scoring (round 8, continuation) — the
  * MODEL-BASED quality signal (CCNet/Wenzek 2020 class) the heuristic
  * gates ([[TextOps.textQuality]], [[Curation.ngramRepetition]]) don't
  * provide: score each document by the average smoothed bigram likelihood
  * of its token stream under a model TRAINED ON THE CORPUS ITSELF.
  * Natural, well-attested text scores high; gibberish and vocabulary
  * salad score low; heavily templated/duplicated text scores anomalously
  * high — both tails are what a perplexity-style filter cuts.
  *
  * The §6 move that makes a "language model" oracle-able: the per-bigram
  * add-one-smoothed conditional probability is QUANTIZED to integer parts
  * per million — `w(x,y) = ((c_xy + 1) · 10⁶) div (c_x + V)` with
  * `c_x = Σ_y c_xy` (pair-left mass, so unsmoothed conditionals sum to 1
  * per context) and V the unigram vocabulary size — integer floor
  * division in both engines (Spark `div`, DuckDB `//`), so per-doc
  * sum/count are exact BIGINTs and the reported score is ONE cast-divide.
  * A true log-perplexity would rank identically per bigram (log is
  * monotone) but its SUM across a doc is a float fold no two engines
  * agree on; the ppm-likelihood average is the engine-stable surrogate
  * that preserves the filter's separating power (planted-case spec).
  *
  * Scale shape: THE n-gram-LM scale property (the [[BpeTrain]] argument):
  * the model is the bigram COUNT table — vocabulary²-bounded, built by
  * one map-side-combinable agg over the pair stream; c_x and V derive
  * from it / the unigram inventory (the count frame feeds the lookup
  * join AND the c_x agg → localCheckpoint per the multi-consumer
  * invariant). Scoring re-runs the pair explode and probes the count
  * table with an UNHINTED vocab-sized join (AQE broadcasts at gate
  * scale, shuffles on an open vocabulary — the round-8 rule); the
  * token-volume pair stream itself is never materialized — it is
  * recomputed by the train and score passes BY DESIGN (the qualitySelect
  * trade: two map passes over 100 TB beat checkpointing a corpus-sized
  * stream). Degenerate docs (< 2 tokens, NULL text): 0/0/0.0 via the
  * left-join + coalesce 0-hit convention.
  *
  * Reference relation: extends §2's curation family; the reference has no
  * text analytics (scoring shape analog: train_model.py's score column).
  */
object LmScore {

  /** ppm quantization of the smoothed conditional probability. */
  val Scale = 1000000L

  private[graft] val pairArrayExpr: String =
    "transform(slice(w, 1, greatest(size(w) - 1, 0)), (t, i) -> struct(t AS x, w[i + 1] AS y))"

  private[graft] def toks(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))

  /** The model: bigram counts (checkpointed — two consumers), pair-left
    * context mass, and the unigram vocabulary size, trained on `corpus`. */
  private[graft] def model(corpus: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val t = toks(corpus)
    val bc = t
      .select(explode(expr(pairArrayExpr)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .localCheckpoint()
    val cx = bc.groupBy("x").agg(sum("c_xy").as("c_x"))
    val v = t.select(explode(col("w")).as("term"))
      .agg(countDistinct("term").as("v"))
    (bc, cx, v)
  }

  /** Score `toScore`'s pair stream against a trained model; total on
    * unseen pairs/contexts (add-one smoothing over left joins).
    * `private[graft]` so InfraSpec can drive it from a PERSISTED model
    * table (train-once-score-many economics). */
  private[graft] def scoreAgainst(toScore: DataFrame,
                                  bc: DataFrame, cx: DataFrame, v: DataFrame): DataFrame = {
    val scored = toks(toScore)
      .select(col("doc_id"), explode(expr(pairArrayExpr)).as("p"))
      .select(col("doc_id"), col("p.x").as("x"), col("p.y").as("y"))
      .join(bc, Seq("x", "y"), "left")
      .join(cx, Seq("x"), "left")
      .crossJoin(v)
      .withColumn("wgt",
        expr(s"((coalesce(c_xy, 0L) + 1L) * $Scale) div (coalesce(c_x, 0L) + v)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("wgt").as("sum_w"))
    toScore.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("sum_w", coalesce(col("sum_w"), lit(0L)))
      .withColumn("lm_ppm",
        expr("CAST(sum_w AS DOUBLE) / greatest(n_bigrams, 1)"))
  }

  def lmScore(documents: DataFrame): DataFrame = {
    val (bc, cx, v) = model(documents)
    scoreAgainst(documents, bc, cx, v)
  }

  /** The DEPLOYMENT form (the [[BpeEncode]] argument — models train once
    * and ship, then score every arriving batch): model trained on the
    * EXISTING corpus (doc_id % 5 ≠ 0, the incremental family's stand-in
    * partition), scoring the arriving batch (doc_id % 5 = 0). Batch docs
    * never influence their own scores (no self-inflation from a
    * duplicated batch), and novel batch bigrams/contexts take the
    * smoothed unseen weight — the real CCNet filter geometry. Cost is
    * batch-proportional on the scoring side; the model is the same
    * vocab²-bounded count table, amortized across batches at 100 TB
    * (the persisted-index economics of [[Dedup.dedupIncrementalLsh]]). */
  def lmScoreIncremental(documents: DataFrame,
                         batchMod: Long = Dedup.IncrementalBatchMod): DataFrame = {
    val (bc, cx, v) = model(documents.filter(col("doc_id") % batchMod =!= 0))
    scoreAgainst(documents.filter(col("doc_id") % batchMod === 0), bc, cx, v)
  }

  def lmScoreQ(documents: DataFrame): DataFrame =
    lmScore(documents)
      .select(col("doc_id"), col("n_bigrams"), col("sum_w"), r("lm_ppm", 4))
      .orderBy("doc_id")

  def lmScoreIncrementalQ(documents: DataFrame): DataFrame =
    lmScoreIncremental(documents)
      .select(col("doc_id"), col("n_bigrams"), col("sum_w"), r("lm_ppm", 4))
      .orderBy("doc_id")

  /** CTE chain ending at `agg(doc_id, n_bigrams, sum_w)` over the scored
    * docs — one text for the two score oracles AND every consumer that
    * composes on the per-doc LM sums (filter_agreement). */
  /** MODEL-ONLY CTE chain (toks/vocab/tprs/bc/cx) — nested by
    * [[lmAggCtes]] and SpanQuality's windowed oracle (one-text rule). */
  private[operators] def lmModelCtes(trainWhere: String): String =
    s"""toks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents WHERE $trainWhere
       |), vocab AS (
       |  SELECT CAST(count(DISTINCT term) AS BIGINT) AS v
       |  FROM (SELECT unnest(w) AS term FROM toks)
       |), tprs AS (
       |  SELECT unnest(w[1 : len(w) - 1]) AS x, unnest(w[2 : len(w)]) AS y
       |  FROM toks
       |), bc AS (
       |  SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy FROM tprs GROUP BY 1, 2
       |), cx AS (
       |  SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM bc GROUP BY 1
       |)""".stripMargin

  private[operators] def lmAggCtes(trainWhere: String, scoreWhere: String): String =
    s"""${lmModelCtes(trainWhere)}, stoks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents WHERE $scoreWhere
       |), prs AS (
       |  SELECT doc_id, unnest(w[1 : len(w) - 1]) AS x, unnest(w[2 : len(w)]) AS y
       |  FROM stoks
       |), sc AS (
       |  SELECT p.doc_id,
       |         ((COALESCE(bc.c_xy, 0) + 1) * $Scale) // (COALESCE(cx.c_x, 0) + v.v) AS wgt
       |  FROM prs p
       |  LEFT JOIN bc ON bc.x = p.x AND bc.y = p.y
       |  LEFT JOIN cx ON cx.x = p.x
       |  CROSS JOIN vocab v
       |), agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |         CAST(sum(wgt) AS BIGINT) AS sum_w
       |  FROM sc GROUP BY 1
       |)""".stripMargin

  /** One query text for both score oracles: `trainWhere` restricts the
    * model corpus, `scoreWhere` the scored docs. */
  private def lmScoreSqlFor(trainWhere: String, scoreWhere: String): String =
    s"""WITH ${lmAggCtes(trainWhere, scoreWhere)}
       |SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams,
       |       COALESCE(a.sum_w, 0) AS sum_w,
       |       ${rsql("CAST(COALESCE(a.sum_w, 0) AS DOUBLE) / greatest(COALESCE(a.n_bigrams, 0), 1)", 4, "lm_ppm")}
       |FROM (SELECT doc_id FROM documents WHERE $scoreWhere) d
       |LEFT JOIN agg a ON a.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  val lmScoreSql: String = lmScoreSqlFor("TRUE", "TRUE")

  val lmScoreIncrementalSql: String = lmScoreSqlFor(
    s"doc_id % ${Dedup.IncrementalBatchMod} <> 0",
    s"doc_id % ${Dedup.IncrementalBatchMod} = 0")
}
