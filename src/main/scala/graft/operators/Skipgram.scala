package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** WINDOWED co-occurrence mining (round 8, continuation) — the word2vec /
  * GloVe statistics pass: top-K unordered token pairs co-occurring within
  * a ±[[WindowK]] token window, ranked by lift. [[Collocations]] covers
  * the adjacent-pair (distance-1) collocation case; embedding-training
  * corpora are built on the WIDER window, where "paris" ~ "france" ranks
  * even though the tokens are rarely adjacent. Same log-free PMI
  * discipline: log is monotone, so ranking by exact
  * `lift = c_ab · N / (c_a · c_b)` IS ranking by PMI, all products in
  * int64, one identically-written CAST-AS-DOUBLE division (§6).
  *
  * Pairs are UNORDERED (least/greatest canonicalization at generation
  * time) — co-occurrence is symmetric, and canonicalizing before the
  * count halves the pair-key space instead of doubling every count.
  *
  * Scale shape: pair generation is MAP-SIDE — one inline nested-transform
  * generator (the Generate child is the array expression per the 11×
  * pushdown-trap rule), emitting ≤ K·|tokens| structs per doc with NO
  * self-join on positions (the naive positions⨝positions form shuffles
  * the corpus twice and is quadratic in doc length); the (a, b) count is
  * map-side combinable. The unigram frame feeds three consumers (two
  * joins + the N total) → localCheckpoint per the multi-consumer
  * invariant. Joins carry no broadcast hint (vocabulary-proportional —
  * the round-8 no-corpus-proportional-hints rule; AQE broadcasts at gate
  * scale). Top-K is orderBy().limit() → TakeOrderedAndProject.
  *
  * Reference relation: extends SURVEY §2's vocabulary family (#60) —
  * the reference has no text analytics.
  */
object Skipgram {

  /** Max token distance for a co-occurring pair (window ±K). */
  val WindowK = 3

  /** Pairs seen fewer times never rank (PMI noise floor, as in
    * [[Collocations.MinPairCount]]). */
  val MinPairCount = 5

  /** Pairs reported. */
  val TopK = 200

  /** One struct(a, b) per within-window pair, generated map-side: for the
    * token at 0-based index i, partners are the next min(K, remaining)
    * tokens; least/greatest canonicalizes the unordered pair. */
  private def pairArrayExpr(k: Int): String =
    s"""flatten(transform(w, (t, i) ->
       |  transform(slice(w, i + 2, greatest(least($k, size(w) - i - 1), 0)),
       |    u -> struct(least(t, u) AS a, greatest(t, u) AS b))))""".stripMargin

  def skipgramCooccur(documents: DataFrame, windowK: Int = WindowK,
                      minPair: Int = MinPairCount, k: Int = TopK): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())").as("w"))
    val uni = toks
      .select(explode(col("w")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val n = uni.agg(sum("c").as("n_tok"))
    val pairs = toks
      .select(explode(expr(pairArrayExpr(windowK))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minPair)
    val scored = pairs
      .join(uni.select(col("term").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("term").as("b"), col("c").as("c_b")), Seq("b"))
      .crossJoin(n)
      .withColumn("lift", expr("CAST(c_ab * n_tok AS DOUBLE) / (c_a * c_b)"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
    scored
      .withColumn("rank",
        row_number().over(Window.orderBy(col("lift").desc, col("a"), col("b"))))
      .select(col("rank"), col("a"), col("b"), col("c_ab"), col("c_a"),
        col("c_b"), r("lift", 4))
  }

  def skipgramCooccurQ(documents: DataFrame): DataFrame =
    skipgramCooccur(documents).orderBy("rank")

  /** DuckDB twin: position frame (parallel unnest + generate_subscripts)
    * self-joined within the window — affordable at gate scale, and its
    * agreement with the map-side generator IS the test that the
    * slice-window generation enumerates exactly the |i-j| ≤ K pairs. */
  val skipgramCooccurSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []) AS w
       |  FROM documents
       |), pos AS (
       |  SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS i FROM toks
       |), uc AS (
       |  SELECT t AS term, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY 1
       |), n AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM uc
       |), pr AS (
       |  SELECT least(p1.t, p2.t) AS a, greatest(p1.t, p2.t) AS b
       |  FROM pos p1 JOIN pos p2
       |    ON p1.doc_id = p2.doc_id AND p2.i > p1.i AND p2.i <= p1.i + $WindowK
       |), pc AS (
       |  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
       |  FROM pr GROUP BY 1, 2
       |  HAVING count(*) >= $MinPairCount
       |), scored AS (
       |  SELECT a, b, c_ab, ua.c AS c_a, ub.c AS c_b,
       |         CAST(c_ab * n_tok AS DOUBLE) / (ua.c * ub.c) AS lift
       |  FROM pc JOIN uc ua ON pc.a = ua.term
       |          JOIN uc ub ON pc.b = ub.term
       |          CROSS JOIN n
       |  ORDER BY lift DESC, a, b LIMIT $TopK
       |)
       |SELECT CAST(row_number() OVER (ORDER BY lift DESC, a, b) AS INT) AS rank,
       |       a, b, c_ab, c_a, c_b,
       |       ${rsql("lift", 4, "lift")}
       |FROM scored
       |ORDER BY rank""".stripMargin
}
