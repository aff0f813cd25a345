package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Class-characteristic TERMS per topic (round 8, continuation) — the
  * cTF-IDF readout of [[TopicClassify]]'s labeling: for each topic, the
  * top-K terms whose within-topic frequency share most exceeds their
  * corpus share (lift), with a min-count cut. "What vocabulary DEFINES
  * this slice" — the sanity check a taxonomy edit is judged by, and the
  * topic-model report beside [[TopicMix]]'s who-has-it matrix.
  * [[Curation.tfidfTopTerms]] ranks terms per DOCUMENT; this ranks per
  * CLASS, normalized against the whole corpus.
  *
  * Cross-engine exactness (§6): lift = `c_tt · n_total / (n_topic ·
  * c_term)` — exact int64 cross-products, ONE identically-written
  * CAST-AS-DOUBLE division, rank-safe (the [[Collocations]] log-free
  * PMI discipline); ties broken (lift DESC, term ASC).
  *
  * Scale shape: the labeler's own plan (broadcast KB-sized lexicon),
  * then the token stream joins doc labels on the doc_id HASH key (both
  * sides corpus-shaped — no broadcast hint, the round-8 rule), ONE
  * map-side-combinable (topic, term) count that every later frame
  * derives from (checkpointed: 3 consumers — term totals, topic totals,
  * scoring), catalog/vocab-sized joins, and a per-topic rank window
  * over ≤ |vocab| rows. Oracle nests topicClassifySql verbatim (the
  * shared-text rule).
  */
object TopicTerms {

  val TopK = 5
  val MinTermCount = 5

  def topicTerms(documents: DataFrame, k: Int = TopK,
                 minCount: Int = MinTermCount): DataFrame = {
    val labels = TopicClassify.topicClassify(documents)
      .select("doc_id", "topic")
    val toks = documents
      .select(col("doc_id"),
        explode(expr(
          "filter(split(lower(trim(coalesce(text, ''))), '\\\\s+'), t -> t <> '')"))
          .as("term"))
    val counts = toks.join(labels, Seq("doc_id"))
      .groupBy("topic", "term").agg(count(lit(1)).as("c_tt"))
      .localCheckpoint()
    val termTot = counts.groupBy("term").agg(sum("c_tt").as("c_term"))
    val topicTot = counts.groupBy("topic").agg(sum("c_tt").as("n_topic"))
    val n = counts.agg(sum("c_tt").as("n_total"))
    val w = Window.partitionBy("topic").orderBy(col("lift").desc, col("term"))
    counts
      .filter(col("c_tt") >= minCount)
      .join(termTot, Seq("term"))
      .join(topicTot, Seq("topic"))
      .crossJoin(broadcast(n))
      .withColumn("lift", expr("CAST(c_tt * n_total AS DOUBLE) / (n_topic * c_term)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("topic"), col("rank"), col("term"), col("c_tt"),
        col("c_term"), col("n_topic"), r("lift", 4))
  }

  def topicTermsQ(documents: DataFrame): DataFrame =
    topicTerms(documents).orderBy("topic", "rank")

  val topicTermsSql: String = {
    val labeler = TopicClassify.topicClassifySql.replace("ORDER BY d.doc_id", "")
    s"""WITH labeled AS (
       |$labeler
       |), toks AS (
       |  SELECT doc_id,
       |         unnest(list_filter(string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+'), t -> t <> '')) AS term
       |  FROM documents
       |), counts AS (
       |  SELECT l.topic, t.term, CAST(count(*) AS BIGINT) AS c_tt
       |  FROM toks t JOIN labeled l ON t.doc_id = l.doc_id
       |  GROUP BY 1, 2
       |), tt AS (
       |  SELECT term, CAST(sum(c_tt) AS BIGINT) AS c_term FROM counts GROUP BY 1
       |), tp AS (
       |  SELECT topic, CAST(sum(c_tt) AS BIGINT) AS n_topic FROM counts GROUP BY 1
       |), n AS (
       |  SELECT CAST(sum(c_tt) AS BIGINT) AS n_total FROM counts
       |), scored AS (
       |  SELECT c.topic, c.term, c.c_tt, tt.c_term, tp.n_topic,
       |         CAST(c.c_tt * n_total AS DOUBLE) / (tp.n_topic * tt.c_term) AS lift
       |  FROM counts c JOIN tt ON c.term = tt.term
       |           JOIN tp ON c.topic = tp.topic
       |           CROSS JOIN n
       |  WHERE c.c_tt >= $MinTermCount
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY topic
       |                 ORDER BY lift DESC, term) AS INT) AS rank
       |  FROM scored
       |)
       |SELECT topic, rank, term, c_tt, c_term, n_topic,
       |       ${rsql("lift", 4, "lift")}
       |FROM ranked
       |WHERE rank <= $TopK
       |ORDER BY topic, rank""".stripMargin
  }
}
