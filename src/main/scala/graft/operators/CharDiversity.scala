package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-level Simpson diversity (round 8, continuation) — the CHAR
  * granularity of the repetition family ([[Curation.ngramRepetition]]
  * gates token n-grams; this catches what tokenization can't see:
  * `aaaaaaa…`, `ababab…`, separator floods, single-glyph spam — the
  * gibberish classes that tokenize into few "words" yet dominate raw
  * bytes). Signal = the Simpson COLLISION index Σ cᵢ²/n² (probability two
  * random character draws collide): natural text sits ≈ 0.06–0.08, a
  * one-glyph doc at 1.0 — and unlike Shannon entropy it needs NO
  * logarithm, so the §6 float discipline is trivial: counts are exact
  * integers and the reported ppm is ONE integer floor division
  * `(Σcᵢ²·10⁶) div n²` (both engines; int64-safe to ~3·10⁶ significant
  * chars per doc — beyond that the doc already failed every length gate).
  * `is_gibberish` at > 25% collision is a pure integer compare.
  *
  * Scale shape: pure fused MAP pass, zero exchanges before the output
  * sort (spec-pinned — the ngramRepetition plan class): chars of the
  * whitespace-stripped lowered text, `array_sort`, and Σ run² via ONE
  * bounded `aggregate` run-length fold (the sort+run-length move that
  * replaced the quadratic top-bigram form in round 7 — O(len·log len)
  * per doc, no per-char explode, no (doc,char) shuffle). The DuckDB
  * oracle deliberately takes the RELATIONAL formulation (char unnest +
  * group-count + Σc²) — an independent computation path, the
  * ngramRepetition oracle pattern. NULL/empty/whitespace-only text →
  * 0/0/0/0/false (totality convention).
  *
  * Reference relation: extends §2's text-quality family (#22/#23/#45);
  * the reference has no text analytics.
  */
object CharDiversity {

  /** Collision ppm above which a doc is flagged (25% — natural text is
    * an order of magnitude below, glyph spam an order above). */
  val GibberishPpm = 250000L

  /** Sorted significant-char array: lowered, all whitespace removed,
    * empty-split artifact filtered. */
  private val charsExpr: String =
    "array_sort(filter(split(regexp_replace(lower(coalesce(text, '')), '\\\\s+', ''), ''), x -> x <> ''))"

  /** Σ run² over the sorted char array via one bounded fold: accumulator
    * (prev, run, acc); finish folds the trailing run in. */
  private val sumSqExpr: String =
    """aggregate(cs,
      |  struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS acc),
      |  (a, x) -> CASE WHEN a.prev IS NULL THEN struct(x AS prev, 1L AS run, 0L AS acc)
      |                 WHEN x = a.prev THEN struct(x AS prev, a.run + 1L AS run, a.acc AS acc)
      |                 ELSE struct(x AS prev, 1L AS run, a.acc + a.run * a.run AS acc) END,
      |  a -> a.acc + a.run * a.run)""".stripMargin

  def charDiversity(documents: DataFrame, gibberishPpm: Long = GibberishPpm): DataFrame =
    documents
      .select(col("doc_id"), expr(charsExpr).as("cs"))
      .withColumn("n_chars_sig", expr("CAST(size(cs) AS BIGINT)"))
      .withColumn("n_distinct_chars", expr("CAST(size(array_distinct(cs)) AS BIGINT)"))
      .withColumn("sum_sq", expr(sumSqExpr))
      .withColumn("collision_ppm",
        expr("(sum_sq * 1000000) div greatest(n_chars_sig * n_chars_sig, 1)"))
      .withColumn("is_gibberish", expr(s"collision_ppm > $gibberishPpm"))
      .drop("cs")

  def charDiversityQ(documents: DataFrame): DataFrame =
    charDiversity(documents)
      .select(col("doc_id"), col("n_chars_sig"), col("n_distinct_chars"),
        col("sum_sq"), col("collision_ppm"), col("is_gibberish"))
      .orderBy("doc_id")

  /** DuckDB twin — deliberately the RELATIONAL formulation (char unnest,
    * group count, Σc²): an independent path to the same integers. */
  val charDiversitySql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |         regexp_replace(lower(COALESCE(text, '')), '\\s+', '', 'g') AS t
       |  FROM documents
       |), cs AS (
       |  SELECT doc_id,
       |         unnest([substring(t, CAST(i AS INT), 1) for i in range(1, len(t) + 1)]) AS ch
       |  FROM base
       |), cc AS (
       |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM cs GROUP BY 1, 2
       |), agg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
       |         CAST(count(*) AS BIGINT) AS k,
       |         CAST(sum(c * c) AS BIGINT) AS d
       |  FROM cc GROUP BY 1
       |)
       |SELECT b.doc_id,
       |       COALESCE(a.n, 0) AS n_chars_sig,
       |       COALESCE(a.k, 0) AS n_distinct_chars,
       |       COALESCE(a.d, 0) AS sum_sq,
       |       (COALESCE(a.d, 0) * 1000000) // greatest(COALESCE(a.n, 0) * COALESCE(a.n, 0), 1) AS collision_ppm,
       |       (COALESCE(a.d, 0) * 1000000) // greatest(COALESCE(a.n, 0) * COALESCE(a.n, 0), 1) > $GibberishPpm AS is_gibberish
       |FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
}
