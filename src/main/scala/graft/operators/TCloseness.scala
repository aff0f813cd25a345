package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T-CLOSENESS AUDIT (round 13) — completes the privacy-release trio
  * over the SAME quasi-id census as [[KAnonymity]] (#217) and
  * [[LDiversity]] (#225): a class can be large (k-safe) and diverse
  * (l-safe) yet still leak when its sensitive-attribute DISTRIBUTION
  * skews far from the global one — observing class membership then
  * shifts the attacker's posterior (the skewness attack, Li et al.
  * 2007, public). Per class: Earth-Mover's Distance between the
  * class's topic distribution and the corpus-global one, over a FIXED
  * topic order; per (lang, source) stratum: classes whose EMD exceeds
  * t, rows exposed in them, and the max distance — the release-review
  * row alongside its two siblings.
  *
  * §6 integer discipline: both distributions are ppm-QUANTIZED first
  * (`cnt·10⁶ div class_size`, same truncating div both engines —
  * Spark `div`, DuckDB `//`), then the ordinal EMD is the classic
  * cumulative form `Σᵢ |Σ_{j≤i}(p_j − q_j)| div (m−1)` over the fixed
  * (alphabetical) topic order — every term ≤ 10⁶ so the sums are
  * BIGINT-safe at ANY corpus size (unlike a cross-multiplied exact
  * form, whose N² blows up at 10¹¹ docs). All cumulands can be
  * negative but the division operand `Σ|cum|` is non-negative, so
  * truncating div needs no sign factoring. The violation gate is
  * strict `> T` (t-closeness HOLDS at distance ≤ t), T = 200000 ppm
  * (t = 0.2, the canonical Li et al. example value).
  *
  * Scale shape: the topic pass is topic_classify's broadcast-lexicon
  * explode+agg; one doc-keyed label join; ONE map-combinable census on
  * (class, topic) — the only data-volume aggregation — then everything
  * downstream runs on |classes|·m rows (classes bounded by
  * |lang|·|source|·7 buckets, catalog-sized). The census frame feeds
  * THREE consumers (class sizes, the global distribution, the
  * densified per-topic counts) → localCheckpoint per the
  * multi-consumer invariant. Densification is a broadcast cross join
  * against the m-row fixed topic frame (the documented
  * catalog-frame class); the cumulative window partitions by class
  * over exactly m rows.
  */
object TCloseness {

  /** Violation threshold in ppm (t = 0.2). */
  val ThresholdPpm = 200000L

  /** The fixed topic order: the lexicon's topics + 'unknown',
    * alphabetical — identical ORDER BY semantics both engines for
    * ASCII lowercase names. */
  val TopicOrder: Seq[String] =
    (TopicClassify.Lexicon.map(_._1).distinct :+ TopicClassify.UnknownTopic).sorted

  private val M = TopicOrder.size.toLong

  def tClosenessAudit(documents: DataFrame,
                      thresholdPpm: Long = ThresholdPpm): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val topics = TopicClassify.topicClassify(documents)
      .select(col("doc_id"), col("topic"))
    // (class, topic) census — the one data-volume agg; 3 consumers.
    val ct = documents
      .select(col("doc_id"), col("lang"), col("source"),
        expr(KAnonymity.BucketExpr).as("len_bucket"))
      .join(topics, Seq("doc_id"))
      .groupBy("lang", "source", "len_bucket", "topic")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val cls = ct.groupBy("lang", "source", "len_bucket")
      .agg(sum("cnt").as("class_size"))
    val topicDf = TopicOrder.toDF("topic")
    // Global distribution, ppm-quantized over the same fixed order.
    val tot = ct.agg(sum("cnt").as("n_tot"))
    val glob = topicDf
      .join(ct.groupBy("topic").agg(sum("cnt").as("g_cnt")), Seq("topic"), "left")
      .crossJoin(tot)
      .select(col("topic"),
        expr("coalesce(g_cnt, 0L) * 1000000L div n_tot").as("q_ppm"))
    // Densify each class over the fixed topic frame, quantize.
    val dens = cls.crossJoin(broadcast(topicDf))
      .join(ct, Seq("lang", "source", "len_bucket", "topic"), "left")
      .select(col("lang"), col("source"), col("len_bucket"), col("class_size"),
        col("topic"),
        expr("coalesce(cnt, 0L) * 1000000L div class_size").as("p_ppm"))
    val w = Window.partitionBy("lang", "source", "len_bucket")
      .orderBy("topic")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val emd = dens.join(broadcast(glob), Seq("topic"))
      .withColumn("cum", sum(col("p_ppm") - col("q_ppm")).over(w))
      .groupBy("lang", "source", "len_bucket", "class_size")
      .agg(expr(s"sum(abs(cum)) div ${M - 1}L").as("emd_ppm"))
    emd.groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("emd_ppm") > thresholdPpm, 1L).otherwise(0L))
          .as("n_skewed_classes"),
        sum(when(col("emd_ppm") > thresholdPpm, col("class_size")).otherwise(0L))
          .as("n_rows_exposed"),
        max("emd_ppm").as("max_emd_ppm"))
      .orderBy("lang", "source")
  }

  def tClosenessAuditQ(documents: DataFrame): DataFrame =
    tClosenessAudit(documents)

  private def topicValues: String =
    TopicOrder.map(t => s"('$t')").mkString(", ")

  val tClosenessAuditSql: String =
    s"""WITH ${TopicClassify.topicAssignCtes}, topics(topic) AS (
       |  VALUES $topicValues
       |), ct AS (
       |  SELECT d.lang, d.source, ${KAnonymity.BucketExpr} AS len_bucket,
       |         t.topic, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents d JOIN tcls t ON d.doc_id = t.doc_id
       |  GROUP BY 1, 2, 3, 4
       |), cls AS (
       |  SELECT lang, source, len_bucket, CAST(sum(cnt) AS BIGINT) AS class_size
       |  FROM ct GROUP BY 1, 2, 3
       |), tot AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS n_tot FROM ct
       |), gdist AS (
       |  SELECT tp.topic,
       |         CAST(COALESCE(g.g_cnt, 0) * 1000000 // t.n_tot AS BIGINT) AS q_ppm
       |  FROM topics tp
       |  LEFT JOIN (SELECT topic, CAST(sum(cnt) AS BIGINT) AS g_cnt
       |             FROM ct GROUP BY 1) g ON tp.topic = g.topic
       |  CROSS JOIN tot t
       |), dens AS (
       |  SELECT c.lang, c.source, c.len_bucket, c.class_size, tp.topic,
       |         CAST(COALESCE(x.cnt, 0) * 1000000 // c.class_size AS BIGINT) AS p_ppm
       |  FROM cls c CROSS JOIN topics tp
       |  LEFT JOIN ct x ON c.lang = x.lang AND c.source = x.source
       |    AND c.len_bucket = x.len_bucket AND tp.topic = x.topic
       |), cum AS (
       |  SELECT d.lang, d.source, d.len_bucket, d.class_size,
       |         CAST(sum(d.p_ppm - g.q_ppm) OVER (
       |           PARTITION BY d.lang, d.source, d.len_bucket
       |           ORDER BY d.topic ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM dens d JOIN gdist g ON d.topic = g.topic
       |), emd AS (
       |  SELECT lang, source, len_bucket, class_size,
       |         CAST(sum(abs(cum)) AS BIGINT) // ${M - 1} AS emd_ppm
       |  FROM cum GROUP BY 1, 2, 3, 4
       |)
       |SELECT lang, source,
       |       CAST(count(*) AS BIGINT) AS n_classes,
       |       CAST(sum(CASE WHEN emd_ppm > $ThresholdPpm THEN 1 ELSE 0 END) AS BIGINT) AS n_skewed_classes,
       |       CAST(sum(CASE WHEN emd_ppm > $ThresholdPpm THEN class_size ELSE 0 END) AS BIGINT) AS n_rows_exposed,
       |       CAST(max(emd_ppm) AS BIGINT) AS max_emd_ppm
       |FROM emd
       |GROUP BY 1, 2
       |ORDER BY lang, source""".stripMargin
}
