package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge learning (round 8, continuation) — the SUBWORD side of the
  * tokenizer-prep family: [[Vocab]] counts whole words and
  * [[TokenizeIds]] applies a whole-word vocabulary; this learns the
  * byte-pair-encoding MERGE TABLE (Sennrich et al. 2016) that a subword
  * tokenizer is actually built from: start from characters + an
  * end-of-word marker, repeatedly merge the most frequent adjacent
  * symbol pair, record the merge order.
  *
  * THE scale property: after ONE corpus pass builds the word-frequency
  * table, every iteration runs on that VOCABULARY-SIZED frame —
  * pair counts are weighted by word frequency, so a 100 TB corpus and
  * its ~10⁷-row word table learn IDENTICAL merges at ~10⁷-row
  * per-iteration cost. The per-iteration argmax is a 1-row driver
  * collect (the [[Ivf]] quantizer precedent); the merge application is
  * a left-to-right greedy fold over each word's symbol array
  * (`aggregate` over ≤|word| symbols), and the words frame is
  * localCheckpoint'd per iteration — the CC-loop discipline, or plan
  * depth grows linearly in merge count.
  *
  * Determinism: pair argmax breaks ties by (count DESC, left ASC,
  * right ASC) — a total order, so the merge table is a pure function of
  * the corpus. No SQL oracle: iterative argmax with data-dependent
  * rewriting has no DuckDB twin (the [[Iir]] / [[MlPipeline]]
  * precedent); BpeTrainSpec re-derives the full merge table with an
  * independent in-memory Scala BPE and pins equality at gate scale.
  */
object BpeTrain {

  /** Merges learned. */
  val NumMerges = 24

  /** End-of-word marker (GPT-2-style word-boundary symbol). */
  val EowMarker = "</w>"

  private def lit1(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Greedy leftmost non-overlapping application of one merge (x, y) to a
    * symbol array column `syms`. */
  private def mergeExpr(x: String, y: String): String = {
    val (lx, ly, lxy) = (lit1(x), lit1(y), lit1(x + y))
    s"""aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) ->
       |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = $lx AND s = $ly
       |       THEN concat(slice(acc, 1, size(acc) - 1), array($lxy))
       |       ELSE concat(acc, array(s)) END)""".stripMargin.replace("\n", " ")
  }

  /** (word, freq, syms) — the vocabulary-sized training frame. */
  private[operators] def wordFreqs(documents: DataFrame): DataFrame =
    documents
      .select(explode(expr("coalesce(split(lower(trim(text)), '\\\\s+'), array())")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // filter guards the engine-version-dependent trailing "" from
      // split-on-empty-regex (Java split semantics)
      .withColumn("syms",
        expr(s"concat(filter(split(word, ''), s -> s != ''), array('$EowMarker'))"))

  /** The learned merge table: (rank, left, right, pair_count). */
  def bpeMerges(documents: DataFrame, numMerges: Int = NumMerges): Seq[(Int, String, String, Long)] = {
    var words = wordFreqs(documents).localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var k = 1
    var done = false
    while (k <= numMerges && !done) {
      val top = words
        .select(col("freq"),
          explode(expr(
            "transform(slice(syms, 1, greatest(size(syms) - 1, 0)), (s, i) -> struct(s AS x, syms[i + 1] AS y))"))
            .as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (x, y, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((k, x, y, cnt))
        val next = words.withColumn("syms", expr(mergeExpr(x, y))).localCheckpoint()
        words.unpersist()
        words = next
        k += 1
      }
    }
    words.unpersist()
    merges.result()
  }

  def bpeTrainQ(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    bpeMerges(documents).toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }
}
