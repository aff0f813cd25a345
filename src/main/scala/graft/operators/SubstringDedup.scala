package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT-SUBSTRING dedup at suffix granularity (round 12) — the duplicate
  * runs the fixed window GRID structurally misses: [[DupSpans]] merges
  * [[ParagraphDedup]]'s stride-8 windows, so a duplicated run that
  * straddles window boundaries is truncated to the grid-aligned windows
  * it fully covers, and a ≥8-token duplicate that covers NO full grid
  * window (offset 8k+4, say) is invisible. The suffix-array literature's
  * contract (Lee et al. 2021, "Deduplicating Training Data Makes
  * Language Models Better" — public) is alignment-free: report every
  * maximal token run of length ≥ L that occurs ≥2 times anywhere in the
  * corpus (within- or cross-document — a suffix array doesn't care whose
  * suffix it was).
  *
  * Equivalence that makes this Spark-expressible WITHOUT building the
  * suffix array imperatively: two suffixes share a prefix of length ≥ L
  * iff their leading L-grams are equal, so "duplicated run of length
  * m ≥ L at position p" ⟺ "the m−L+1 consecutive STRIDE-1 L-grams at
  * p..p+m−L are each duplicated". Sorting the corpus's L-gram stream IS
  * the suffix sort truncated at depth L (the sorted-rotations view), the
  * group sizes are the LCP≥L buckets, and the per-doc gaps-and-islands
  * merge of duplicated positions reconstructs exactly the maximal
  * extents the suffix-array + LCP walk would report. Output per doc:
  * maximal spans [start_token, end_token] (1-based, inclusive) with the
  * covering gram count.
  *
  * Scale shape (100 TB): the gram stream is |tokens| rows of
  * (doc_id, pos, 64-bit gram hash) — stride 1 is width× the grid's
  * volume, which IS the exactness contract's price, and 8× fewer bytes
  * per row than carrying gram text (the pair-miner hash-not-string
  * discipline; a 64-bit collision would mark one position duplicated —
  * the exact-string DuckDB oracle guards it). ONE data-volume exchange:
  * the count-per-gram window on gh (WindowExec, no join-back — the
  * group-by+semi-join form would shuffle the stream twice). Everything
  * after runs on the SPARSE duplicated-position frame: one doc-keyed
  * exchange feeds both the islands row_number window and the (doc, grp)
  * aggregation (hash(doc_id) satisfies the grp aggregation's clustered
  * distribution — the [[DupSpans]] argument). Hot grams (boilerplate) =
  * hot reducers in the gh window: the [[Dedup.ngramJaccardPairs]] maxDf
  * analog would cap them lossily; kept exact here, and a capped variant
  * inherits this one's oracle the way maxDf inherits the pair miner's.
  *
  * Reference relation: extends §2.C sub-document dedup like
  * [[DupSpans]]/[[DupPassages]] — the reference's records are atomic.
  */
object SubstringDedup {

  /** Minimum duplicated run length in tokens — the grid family's window
    * width, so grid-aligned answers are directly comparable. */
  val MinRunTokens: Int = ParagraphDedup.ParaWindowTokens

  /** Stride-1 L-gram hash array over the token array `w`, inline at the
    * generator per the explode invariant; the `greatest(..., 1)` inside
    * sequence + the `greatest(..., 0)` outer slice length keep short and
    * null docs total (Spark's sequence(1, 0) would DESCEND — the
    * documented CASE-free guard shape). */
  private def gramArrayExpr(l: Int): String =
    s"slice(transform(sequence(1, greatest(size(w) - $l + 1, 1)), " +
      s"i -> xxhash64(concat_ws(' ', slice(w, i, $l)))), " +
      s"1, greatest(size(w) - $l + 1, 0))"

  /** (doc_id, pos, gh): the stride-1 gram-hash stream, pos 1-based. */
  private[graft] def gramStream(documents: DataFrame,
                                l: Int = MinRunTokens): DataFrame =
    documents
      .select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
      .select(col("doc_id"), posexplode(expr(gramArrayExpr(l))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gh"))

  /** Maximal duplicated substrings of length ≥ l tokens, per document. */
  def substringDedup(documents: DataFrame, l: Int = MinRunTokens): DataFrame = {
    val dup = gramStream(documents, l)
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("gh")))
      .filter(col("cnt") >= 2)
      .select("doc_id", "pos")
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    dup
      .withColumn("grp", col("pos") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min("pos").as("span_start"), max("pos").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("n_grams"),
        col("span_start").as("start_token"),
        (col("span_end") + lit(l.toLong - 1L)).as("end_token"))
  }

  def substringDedupQ(documents: DataFrame): DataFrame =
    substringDedup(documents).orderBy("doc_id", "span_start")

  /** DuckDB twin over EXACT gram strings (the collision guard): the same
    * stride-1 positions via a struct list comprehension, count-per-gram
    * window, and the same islands merge. */
  val substringDedupSql: String = {
    val l = MinRunTokens
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents
       |), pg AS (
       |  SELECT doc_id,
       |         unnest([{'p': i, 'g': array_to_string(w[i:i+${l - 1}], ' ')}
       |                 for i in range(1, len(w) - ${l - 2})]) AS s
       |  FROM toks
       |), posg AS (
       |  SELECT doc_id, CAST(s.p AS BIGINT) AS pos, s.g AS gram FROM pg
       |), dup AS (
       |  SELECT doc_id, pos
       |  FROM (SELECT doc_id, pos,
       |               count(*) OVER (PARTITION BY gram) AS cnt
       |        FROM posg)
       |  WHERE cnt >= 2
       |), isl AS (
       |  SELECT doc_id, pos,
       |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |  FROM dup
       |)
       |SELECT doc_id,
       |       min(pos) AS span_start, max(pos) AS span_end,
       |       CAST(count(*) AS BIGINT) AS n_grams,
       |       min(pos) AS start_token,
       |       max(pos) + ${l - 1} AS end_token
       |FROM isl
       |GROUP BY doc_id, grp
       |ORDER BY doc_id, span_start""".stripMargin
  }
}
