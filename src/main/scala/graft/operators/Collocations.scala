package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Collocation mining (round 8, continuation) — the corpus-statistics twin
  * of [[Vocab]]: the top-K adjacent-pair collocations ranked by pointwise
  * mutual information, the standard signal for multi-word expressions
  * ("new york", "machine learning") a tokenizer-merge or phrase-aware
  * filter consumes after the raw frequency inventory.
  *
  * PMI without `log` (the §6 float discipline — `ln` output is the one
  * float no two engines agree on bit-for-bit): PMI = log lift where
  * `lift = P(xy) / (P(x)·P(y)) = c_xy · N / (c_x · c_y)` under the
  * unigram-N convention, and log is strictly monotone — so RANKING by
  * lift IS ranking by PMI, and the emitted score is the lift itself
  * (Parity-rounded for display; ordering and the top-K cut use the exact
  * value). All products stay exact in int64 (c_xy·N ≤ N² ≪ 2⁶³ until the
  * corpus holds ~3·10⁹ tokens per count cell — at which point the counts
  * frame is aggregated anyway and the cast-then-divide keeps the same
  * bit-identity), with ONE `CAST AS DOUBLE` division written identically
  * in both engines.
  *
  * Scale shape: one inline-generator pair explode (struct(x, y) built AT
  * the Generate child) → (x, y) map-side-combinable count; the unigram
  * count frame is vocabulary-sized and feeds THREE consumers (x-join,
  * y-join, N total) so it is localCheckpoint'd per the multi-consumer
  * invariant; both joins are vocab×vocab with no broadcast hint — AQE
  * picks broadcast at gate scale and a shuffled join on an open
  * vocabulary (the round-8 no-corpus-proportional-hints rule). The top-K
  * cut is `orderBy().limit(K)` → TakeOrderedAndProject, never a global
  * sort; the rank window runs over K rows.
  *
  * Reference relation: extends §2's vocabulary family (#60 `vocab_build`)
  * with the association statistic; the reference has no text analytics.
  */
object Collocations {

  /** Pairs seen fewer times than this never rank (PMI is noise-dominated
    * at low counts — the standard min-count cut). */
  val MinPairCount = 5

  /** Collocations reported. */
  val TopK = 200

  /** Inline pair-struct array over `w`: one struct(x, y) per adjacent
    * pair; slice-length via greatest() (the Generate-path discipline). */
  private val pairArrayExpr: String =
    "transform(slice(w, 1, greatest(size(w) - 1, 0)), (t, i) -> struct(t AS x, w[i + 1] AS y))"

  def bigramPmi(documents: DataFrame, minPair: Int = MinPairCount,
                k: Int = TopK): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))
    val uni = toks
      .select(explode(col("w")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val n = uni.agg(sum("c").as("n_tok"))
    val pairs = toks
      .select(explode(expr(pairArrayExpr)).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minPair)
    val scored = pairs
      .join(uni.select(col("term").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uni.select(col("term").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(n)
      .withColumn("lift", expr("CAST(c_xy * n_tok AS DOUBLE) / (c_x * c_y)"))
      .orderBy(col("lift").desc, col("x"), col("y"))
      .limit(k)
    scored
      .withColumn("rank",
        row_number().over(Window.orderBy(col("lift").desc, col("x"), col("y"))))
      .select(col("rank"), col("x"), col("y"), col("c_xy"), col("c_x"),
        col("c_y"), r("lift", 4))
  }

  def bigramPmiQ(documents: DataFrame): DataFrame =
    bigramPmi(documents).orderBy("rank")

  /** DuckDB twin: zipped double-unnest pair stream, same exact-lift order
    * and min-count cut. */
  val bigramPmiSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents
       |), uni AS (
       |  SELECT unnest(w) AS term FROM toks
       |), uc AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1
       |), n AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uc
       |), pairs AS (
       |  SELECT unnest(w[1 : len(w) - 1]) AS x, unnest(w[2 : len(w)]) AS y
       |  FROM toks
       |), pc AS (
       |  SELECT x, y, CAST(count(*) AS BIGINT) AS c_xy
       |  FROM pairs GROUP BY 1, 2
       |  HAVING count(*) >= $MinPairCount
       |), scored AS (
       |  SELECT x, y, c_xy, ux.c AS c_x, uy.c AS c_y,
       |         CAST(c_xy * n_tok AS DOUBLE) / (ux.c * uy.c) AS lift
       |  FROM pc JOIN uc ux ON pc.x = ux.term
       |          JOIN uc uy ON pc.y = uy.term
       |          CROSS JOIN n
       |  ORDER BY lift DESC, x, y LIMIT $TopK
       |)
       |SELECT CAST(row_number() OVER (ORDER BY lift DESC, x, y) AS INT) AS rank,
       |       x, y, c_xy, c_x, c_y,
       |       ${rsql("lift", 4, "lift")}
       |FROM scored
       |ORDER BY rank""".stripMargin
}
