package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** BPE application (round 8, continuation) — the deploy side of
  * [[BpeTrain]]: segment every word with a COMMITTED merge table (the
  * production contract — tokenizers are trained once and shipped; this
  * table is [[BpeTrain.bpeMerges]] on the sf0.01 corpus, equality
  * spec-pinned) and report per-doc subword economics (fertility =
  * subwords per word — the sequence-length planning signal
  * [[TokenHistogram]] tracks at word granularity).
  *
  * The cross-engine trick: greedy leftmost non-overlapping merge
  * application IS `replace()` semantics. Each word becomes a
  * delimiter-WRAPPED symbol string (`␟c␟` per symbol, U+001F never
  * occurs in text), and one merge (x, y) is `replace(enc, '␟x␟␟y␟',
  * '␟xy␟')` — both engines' replace scans left-to-right over
  * non-overlapping matches, which is exactly BPE's application order,
  * and the per-symbol wrapping keeps boundaries intact under adjacent
  * merges (the naive space-separated form corrupts runs: ' x x x x '
  * consumes the separator its next match needs). The 24-step chain is
  * GENERATED from one Scala list into both engines' texts (the
  * [[Sampling]] CASE discipline — they cannot drift).
  *
  * Scale shape: encoding runs once per DISTINCT word (vocabulary-sized
  * frame, chained codegen'd string ops, zero exchanges), then joins back
  * to the per-doc term-frequency frame on the word key — the
  * [[TokenizeIds]] lookup-probe shape, no corpus-proportional broadcast
  * hint (AQE chooses). Docs whose text yields zero words are absent by
  * construction (inner lookup on an empty stream).
  */
object BpeEncode {

  /** U+001F unit separator — the symbol wrapper. */
  val US = "\u001f"

  /** The committed merge table: [[BpeTrain]] output (rank order) on the
    * sf0.01 documents corpus; BpeEncodeSpec re-derives it. */
  val Merges: Seq[(String, String)] = Seq(
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"))

  /** 24 chained replace() steps around an initial wrapped-symbol
    * expression; `q` renders a string literal for the target dialect. */
  private def replaceChain(init: String, q: String => String): String =
    Merges.foldLeft(init) { case (acc, (x, y)) =>
      s"replace($acc, ${q(US + x + US + US + y + US)}, ${q(US + x + y + US)})" }

  private def sparkLit(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
  private def duckLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private val sparkInit =
    s"concat_ws('', transform(concat(filter(split(word, ''), s -> s != ''), array('</w>')), " +
      s"s -> concat('$US', s, '$US')))"

  private val duckInit =
    s"array_to_string(list_transform(string_split(word, '') || ['</w>'], " +
      s"s -> '$US' || s || '$US'), '')"

  def bpeEncode(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("doc_id"),
        explode(expr(
          "filter(coalesce(split(lower(trim(text)), '\\\\s+'), array()), w -> w != '')"))
          .as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val wenc = tf.select("word").distinct()
      .withColumn("enc", expr(replaceChain(sparkInit, sparkLit)))
      .withColumn("n_sym", expr(s"size(split(enc, '$US$US'))"))
    tf.join(wenc.select("word", "n_sym"), Seq("word"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_words"), sum(expr("tf * n_sym")).as("n_subwords"))
      .withColumn("subword_ratio", expr("CAST(n_subwords AS DOUBLE) / n_words"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"), r("subword_ratio", 4))
  }

  def bpeEncodeQ(documents: DataFrame): DataFrame =
    bpeEncode(documents).orderBy("doc_id")

  val bpeEncodeSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(list_filter(COALESCE(string_split_regex(lower(trim(text)), '\\s+'), []),
       |                            w -> w != '')) AS word
       |  FROM documents
       |), tf AS (
       |  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
       |), wenc AS (
       |  SELECT word,
       |         CAST(len(string_split(${replaceChain(duckInit, duckLit)}, '$US$US')) AS INT) AS n_sym
       |  FROM (SELECT DISTINCT word FROM tf)
       |), agg AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_words,
       |         CAST(sum(tf * n_sym) AS BIGINT) AS n_subwords
       |  FROM tf JOIN wenc USING (word)
       |  GROUP BY 1
       |)
       |SELECT doc_id, n_words, n_subwords,
       |       ${rsql("(CAST(n_subwords AS DOUBLE) / n_words)", 4, "subword_ratio")}
       |FROM agg
       |ORDER BY doc_id""".stripMargin
}
