package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SOURCE × TOPIC mixture matrix (round 8, continuation) — the readout
  * [[TopicClassify]] exists to feed: how each ingest source decomposes
  * across the taxonomy (doc counts, token mass, within-source ppm).
  * [[MixturePlan]] compiles target weights into a replication plan; this
  * is the measured CURRENT mixture those targets are set against —
  * "src3 is 70% execution-flavored, upweighting it skews the blend".
  *
  * §6: counts and whitespace token mass are BIGINTs; within-source share
  * is integer ppm over the source's doc count (window sum). The oracle
  * nests topicClassifySql's labeling CTEs verbatim minus its ORDER BY
  * (the shared-text rule) joined back to documents for source/tokens.
  *
  * Scale shape: the labeler's own shapes (broadcast lexicon, doc-keyed
  * windows) plus one map-side-combinable (source, topic) rollup —
  * catalog × taxonomy cells — and a cell-sized share window.
  */
object TopicMix {

  def topicMix(documents: DataFrame): DataFrame = {
    val labeled = TopicClassify.topicClassify(documents)
      .select(col("doc_id"), col("topic"))
    val cells = documents
      .select(col("doc_id"), col("source"),
        expr("CAST(size(filter(coalesce(split(lower(trim(text)), '\\\\s+'), array()), t -> t <> '')) AS BIGINT)")
          .as("n_tokens"))
      .join(labeled, Seq("doc_id"))
      .groupBy("source", "topic")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("token_mass"))
    cells
      .withColumn("src_total", sum("n_docs").over(Window.partitionBy("source")))
      .withColumn("share_ppm", expr("n_docs * 1000000 div src_total"))
      .select(col("source"), col("topic"), col("n_docs"), col("token_mass"),
        col("share_ppm"))
      .orderBy("source", "topic")
  }

  def topicMixQ(documents: DataFrame): DataFrame =
    topicMix(documents)

  val topicMixSql: String = {
    val labeler = TopicClassify.topicClassifySql.replace("ORDER BY d.doc_id", "")
    s"""WITH labeled AS (
       |$labeler
       |), cells AS (
       |  SELECT d.source, l.topic,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(CAST(len(list_filter(COALESCE(string_split_regex(lower(trim(d.text)), '\\s+'), []), t -> t <> '')) AS BIGINT)) AS BIGINT) AS token_mass
       |  FROM documents d JOIN labeled l ON d.doc_id = l.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT source, topic, n_docs, token_mass,
       |       n_docs * 1000000 // CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS share_ppm
       |FROM cells
       |ORDER BY source, topic""".stripMargin
  }
}
