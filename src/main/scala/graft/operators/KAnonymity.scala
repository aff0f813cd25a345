package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-ANONYMITY AUDIT (round 10) — the release-side privacy complement
  * to [[PiiRedact]]: redaction strips direct identifiers, but a row is
  * still re-identifiable when its QUASI-IDENTIFIER combination is rare
  * (the public k-anonymity model, Sweeney 2002). Before a corpus (or a
  * per-document metadata table) ships, count each quasi-id equivalence
  * class and report, per (lang, source) stratum, how many classes and
  * rows sit below k — the number a release review actually reads.
  *
  * Quasi-ids here: (lang, source, length bucket) — the length bucket is
  * [[TokenHistogram]]'s power-of-two CASE bounds over n_chars (no log2,
  * identical text both engines), the document analog of the classic
  * zip/age/sex triple: metadata any recipient sees.
  *
  * §6: all counts BIGINT; k is a compile-time dial (default 5).
  * Scale shape: one map-side-combinable groupBy over the quasi-id tuple
  * (the class census — the only data-volume stage), then a
  * |classes|-sized rollup to strata. No joins, no windows.
  */
object KAnonymity {

  val K = 5L

  /** Power-of-two length bucket, CASE bounds (shared text rule); shared
    * with [[LDiversity]] so both audits census the SAME quasi-id
    * classes. */
  private[graft] val BucketExpr =
    """CASE WHEN n_chars < 64 THEN 64
      |     WHEN n_chars < 128 THEN 128
      |     WHEN n_chars < 256 THEN 256
      |     WHEN n_chars < 512 THEN 512
      |     WHEN n_chars < 1024 THEN 1024
      |     WHEN n_chars < 2048 THEN 2048
      |     ELSE 4096 END""".stripMargin

  def kAnonymityAudit(documents: DataFrame, k: Long = K): DataFrame =
    documents
      .select(col("lang"), col("source"), expr(BucketExpr).as("len_bucket"))
      .groupBy("lang", "source", "len_bucket")
      .agg(count(lit(1)).as("class_size"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("n_rows_at_risk"),
        min("class_size").as("min_class_size"))
      .orderBy("lang", "source")

  def kAnonymityAuditQ(documents: DataFrame): DataFrame =
    kAnonymityAudit(documents)

  val kAnonymityAuditSql: String =
    s"""WITH classes AS (
       |  SELECT lang, source, $BucketExpr AS len_bucket,
       |         CAST(count(*) AS BIGINT) AS class_size
       |  FROM documents
       |  GROUP BY 1, 2, 3
       |)
       |SELECT lang, source,
       |       CAST(count(*) AS BIGINT) AS n_classes,
       |       CAST(sum(CASE WHEN class_size < $K THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
       |       CAST(sum(CASE WHEN class_size < $K THEN class_size ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       |       CAST(min(class_size) AS BIGINT) AS min_class_size
       |FROM classes
       |GROUP BY 1, 2
       |ORDER BY lang, source""".stripMargin
}
