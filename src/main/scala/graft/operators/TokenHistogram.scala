package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Per-source TOKEN-LENGTH histogram (round 8) — the sequence-length
  * planning signal a training pipeline reads before choosing context
  * length, packing strategy, and truncation policy: how many documents
  * and tokens each source contributes per power-of-two length bucket
  * (`[2^k, 2^{k+1})`), plus each bucket's share of its source's docs.
  *
  * Bucket assignment is a CASE over integer range boundaries generated
  * from ONE Scala list — exact integer compares on both engines, no
  * `log2()` (transcendental, libm-dependent — the §6 discipline). The
  * share is a single division of exact integers. The bucket label is the
  * range's lower bound, so output sorts numerically.
  *
  * Scale shape: one fused map pass (the BPE-ish token count rides the
  * scan) + ONE map-side-combinable aggregation on (source, bucket) —
  * tens of output rows summarize any corpus size; the same plan class as
  * [[Curation.corpusReport]].
  */
object TokenHistogram {

  /** Bucket lower bounds: 0, 1, 2, 4, … 4096; the last is open-ended. */
  val BucketBounds: Seq[Long] = 0L +: (0 to 12).map(1L << _)

  /** `CASE WHEN n < 1 THEN 0 WHEN n < 2 THEN 1 … ELSE 4096 END` —
    * identical text on both engines. */
  private[graft] val bucketCase: String =
    BucketBounds.sliding(2).collect { case Seq(lo, hi) =>
      s"WHEN n_tokens < $hi THEN $lo"
    }.mkString("CASE ", " ", s" ELSE ${BucketBounds.last} END")

  def tokenHistogram(documents: DataFrame): DataFrame = {
    val perSource = Window.partitionBy("source")
    documents
      .withColumn("n_tokens",
        expr(s"size(regexp_extract_all(coalesce(text, ''), '${TextOps.BpePattern.replace("\\", "\\\\")}', 0))"))
      .withColumn("bucket", expr(bucketCase))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens").cast("long")).as("sum_tokens"))
      .withColumn("source_docs", sum("n_docs").over(perSource))
      .withColumn("doc_share", expr("CAST(n_docs AS DOUBLE) / source_docs"))
      .select(col("source"), col("bucket"), col("n_docs"), col("sum_tokens"),
        col("doc_share"))
  }

  def tokenHistogramQ(documents: DataFrame): DataFrame =
    tokenHistogram(documents)
      .select(col("source"), col("bucket"), col("n_docs"), col("sum_tokens"),
        r("doc_share", 4))
      .orderBy("source", "bucket")

  val tokenHistogramSql: String =
    s"""WITH t AS (
       |  SELECT source,
       |         len(regexp_extract_all(COALESCE(text, ''), '${TextOps.BpePattern}')) AS n_tokens
       |  FROM documents
       |), b AS (
       |  SELECT source, $bucketCase AS bucket, n_tokens
       |  FROM t
       |), g AS (
       |  SELECT source, bucket,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
       |  FROM b GROUP BY 1, 2
       |)
       |SELECT source, bucket, n_docs, sum_tokens,
       |       ${rsql("(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (PARTITION BY source))", 4, "doc_share")}
       |FROM g
       |ORDER BY source, bucket""".stripMargin
}
