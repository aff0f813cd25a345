package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L-DIVERSITY AUDIT (round 12) — the homogeneity-attack complement to
  * [[KAnonymity]] (Machanavajjhala et al. 2006, public): a k-anonymous
  * class still leaks when every row in it shares the SAME sensitive
  * value — re-identifying the class reveals the attribute without
  * singling out a row. Same quasi-id census as [[KAnonymity]] (lang,
  * source, [[KAnonymity.BucketExpr]] length bucket — deliberately the
  * SAME classes, so the two audits read together), sensitive attribute
  * = the document's [[TopicClassify]] label (content class: exactly
  * what quasi-id metadata must not determine). Per (lang, source)
  * stratum: classes below l distinct topics, rows exposed in them, and
  * the minimum diversity — the release-review row.
  *
  * §6: all counts BIGINT; l is a compile-time dial (default 2 — the
  * pure homogeneity gate). Scale shape: the topic pass is
  * topic_classify's (broadcast lexicon, data-volume explode+agg); one
  * doc-keyed join attaches labels; the class census groups on the
  * quasi-id tuple with a distinct-topic count (partial-aggregated on
  * (class, topic)); the stratum rollup is |classes|-sized. Oracle
  * nests [[TopicClassify.topicAssignCtes]] verbatim (lang_confusion
  * precedent).
  */
object LDiversity {

  val L = 2L

  def lDiversityAudit(documents: DataFrame, l: Long = L): DataFrame = {
    val topics = TopicClassify.topicClassify(documents)
      .select(col("doc_id"), col("topic"))
    documents
      .select(col("doc_id"), col("lang"), col("source"),
        expr(KAnonymity.BucketExpr).as("len_bucket"))
      .join(topics, Seq("doc_id"))
      .groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("class_size"),
        countDistinct("topic").as("n_topics"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("n_topics") < l, 1L).otherwise(0L)).as("n_low_div_classes"),
        sum(when(col("n_topics") < l, col("class_size")).otherwise(0L))
          .as("n_rows_exposed"),
        min("n_topics").as("min_diversity"))
      .orderBy("lang", "source")
  }

  def lDiversityAuditQ(documents: DataFrame): DataFrame =
    lDiversityAudit(documents)

  val lDiversityAuditSql: String =
    s"""WITH ${TopicClassify.topicAssignCtes}, classes AS (
       |  SELECT d.lang, d.source, ${KAnonymity.BucketExpr} AS len_bucket,
       |         CAST(count(*) AS BIGINT) AS class_size,
       |         CAST(count(DISTINCT t.topic) AS BIGINT) AS n_topics
       |  FROM documents d JOIN tcls t ON d.doc_id = t.doc_id
       |  GROUP BY 1, 2, 3
       |)
       |SELECT lang, source,
       |       CAST(count(*) AS BIGINT) AS n_classes,
       |       CAST(sum(CASE WHEN n_topics < $L THEN 1 ELSE 0 END) AS BIGINT) AS n_low_div_classes,
       |       CAST(sum(CASE WHEN n_topics < $L THEN class_size ELSE 0 END) AS BIGINT) AS n_rows_exposed,
       |       CAST(min(n_topics) AS BIGINT) AS min_diversity
       |FROM classes
       |GROUP BY 1, 2
       |ORDER BY lang, source""".stripMargin
}
