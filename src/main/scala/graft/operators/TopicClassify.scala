package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted-lexicon TOPIC CLASSIFICATION (round 8, continuation) — the
  * weak-supervision labeling step a mixture designer runs before
  * [[MixturePlan]]: assign every document a domain/topic label from
  * curated keyword lexicons (the "which slice is code / legal / medical"
  * pass that decides mixture strata). Unlike [[Lexicon]]'s compile-time
  * ±IN-lists, the lexicon here is a DATA TABLE (topic, word, weight) —
  * production deployments swap in their 10⁴-row taxonomy without
  * recompiling, and the join stays a broadcast because taxonomies are
  * KB-sized, never corpus-sized.
  *
  * Cross-engine exactness (§6): scores are integer weight sums, hit
  * counts are integers, and the winner is a row_number over the total
  * (score DESC, topic ASC) key — identical semantics both engines; docs
  * with zero lexicon hits label 'unknown' with score 0 via the left
  * join back to the documents spine (NULL-text-safe: no tokens, no
  * hits, 'unknown').
  *
  * Scale shape: one inline-exploded token stream (Generate child is the
  * expression — the 11× trap rule), one BroadcastHashJoin against the
  * KB-sized lexicon (probe side never shuffles), a map-side-combinable
  * (doc_id, topic) aggregation, a doc_id rank window, and one join back
  * to the doc spine. Every post-join frame is ≤ |docs| · |topics| rows.
  */
object TopicClassify {

  /** Demo taxonomy over the gate corpus's vocabulary — a real deployment
    * loads its own (topic, word, weight) table; every downstream shape
    * is size-independent up to broadcastability. */
  val Lexicon: Seq[(String, String, Long)] = Seq(
    ("execution", "join", 2L), ("execution", "hash", 2L),
    ("execution", "merge", 2L), ("execution", "sort", 1L),
    ("execution", "agg", 1L), ("execution", "filter", 1L),
    ("execution", "group", 1L),
    ("storage", "scan", 2L), ("storage", "table", 2L),
    ("storage", "column", 2L), ("storage", "row", 1L),
    ("storage", "data", 1L), ("storage", "line", 1L),
    ("streaming", "stream", 2L), ("streaming", "window", 2L),
    ("streaming", "batch", 1L), ("streaming", "spark", 1L))

  val UnknownTopic = "unknown"

  private val tokExpr =
    "filter(split(lower(trim(coalesce(text, ''))), '\\\\s+'), t -> t <> '')"

  def lexiconDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Lexicon.toDF("topic", "word", "weight")
  }

  def topicClassify(documents: DataFrame,
                    lexicon: Option[DataFrame] = None): DataFrame = {
    val lex = lexicon.getOrElse(lexiconDf(documents.sparkSession))
    val hits = documents
      .select(col("doc_id"), explode(expr(tokExpr)).as("term"))
      .join(broadcast(lex), col("term") === col("word"))
      .groupBy("doc_id", "topic")
      .agg(sum("weight").as("score"), count(lit(1)).as("n_hits"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("topic"))
    val winners = hits
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("topic"), col("score"), col("n_hits"))
    documents.select("doc_id")
      .join(winners, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("topic"), lit(UnknownTopic)).as("topic"),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  def topicClassifyQ(documents: DataFrame): DataFrame =
    topicClassify(documents).orderBy("doc_id")

  private def lexValues: String =
    Lexicon.map { case (t, w, wt) =>
      s"('$t', '$w', CAST($wt AS BIGINT))"
    }.mkString(",\n       |         ")

  /** The assignment chain factored for nesting oracles (lang_confusion
    * precedent): ends in `tcls(doc_id, topic, score, n_hits)`. */
  private[operators] val topicAssignCtes: String =
    s"""lex(topic, word, weight) AS (
       |  VALUES $lexValues
       |), toks AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+'), t -> t <> '')) AS term
       |  FROM documents
       |), hits AS (
       |  SELECT t.doc_id, l.topic,
       |         CAST(sum(l.weight) AS BIGINT) AS score,
       |         CAST(count(*) AS BIGINT) AS n_hits
       |  FROM toks t JOIN lex l ON t.term = l.word
       |  GROUP BY 1, 2
       |), win AS (
       |  SELECT doc_id, topic, score, n_hits,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY score DESC, topic) AS rn
       |  FROM hits
       |), tcls AS (
       |  SELECT d.doc_id,
       |         COALESCE(w.topic, '$UnknownTopic') AS topic,
       |         COALESCE(w.score, 0) AS score,
       |         COALESCE(w.n_hits, 0) AS n_hits
       |  FROM documents d
       |  LEFT JOIN (SELECT * FROM win WHERE rn = 1) w ON d.doc_id = w.doc_id
       |)""".stripMargin

  val topicClassifySql: String =
    s"""WITH $topicAssignCtes
       |SELECT doc_id, topic, score, n_hits
       |FROM tcls
       |ORDER BY doc_id""".stripMargin
}
