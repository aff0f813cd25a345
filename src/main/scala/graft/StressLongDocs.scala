package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Unregistered measurement tool (like StressDf2/ProfileContam): long-
  * document stress for the curation MAP passes. The gate corpus's docs are
  * ~30 words; a real pretraining corpus has 100k-token documents, and
  * doc_ngram_repetition's top-bigram term is O(distinct·len) PER ROW —
  * quadratic in document length. This tool measures, at CONSTANT total
  * token volume (so the comparison isolates per-doc length, not corpus
  * size):
  *
  *   - the quadratic top2 expression (round-6 form) vs the sort+run-length
  *     form (array_sort + aggregate over adjacent equals, O(n log n)) on
  *     1× (~30-word) and 100× (~3000-word) docs;
  *   - contamination_check's 8-gram transform+explode on the same corpora.
  *
  * Both top2 forms compute the SAME value (max multiplicity over bigrams);
  * the run-length form additionally returns 0 instead of NULL on an empty
  * array (aggregate's finish over the zero state), matching the
  * degenerate-doc convention without the coalesce.
  */
object StressLongDocs {

  /** Deterministic synthetic corpus: `nDocs` docs of `wordsPerDoc` words
    * drawn from a ~1000-word vocabulary by hash — same family as the gate
    * corpus's word pool, so bigram distinctness is comparably high. */
  def synth(spark: SparkSession, nDocs: Long, wordsPerDoc: Int): DataFrame =
    spark.range(nDocs).toDF("doc_id")
      .withColumn("text", expr(
        s"concat_ws(' ', transform(sequence(1, $wordsPerDoc), i -> concat('w', pmod(hash(doc_id, i), 1000))))"))
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("synthetic"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32, col("doc_id"))
      .localCheckpoint()

  /** round-6 top2: O(distinct·len) per row (kept here as the A/B foil). */
  val quadTop2 =
    "coalesce(array_max(transform(array_distinct(g2), d -> size(filter(g2, y -> y = d)))), 0)"

  /** sort + run-length top2 — the SHIPPING expression (Curation's
    * constant, so the cross-check below always validates production). */
  val runLenTop2: String = Curation.Top2RunLenExpr

  def top2Frame(docs: DataFrame, top2Expr: String): DataFrame =
    docs
      .withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
      .withColumn("g2", expr(Curation.G2Expr))
      .withColumn("top2", expr(top2Expr))
      .select("doc_id", "top2")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Double = {
      f // warmup
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"STRESS $name%-48s ${ts.min}%8.3f s")
      ts.min
    }

    // constant volume: 600k tokens either way
    val base = synth(spark, 20000L, 30)
    val long100 = synth(spark, 200L, 3000)
    println(s"corpora: 1x = 20000 docs x 30 words; 100x = 200 docs x 3000 words")

    // cross-check: both expressions agree on both corpora before timing
    for ((docs, tag) <- Seq((base, "1x"), (long100, "100x"))) {
      val quad = top2Frame(docs, quadTop2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val rl = top2Frame(docs, runLenTop2).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      require(quad == rl, s"$tag: run-length top2 diverges from quadratic top2")
      println(s"CHECK $tag: run-length == quadratic on ${quad.size} docs " +
        s"(max top2 = ${quad.values.max})")
    }

    for ((docs, tag) <- Seq((base, "1x"), (long100, "100x"))) {
      time(s"top2 quadratic        $tag") {
        top2Frame(docs, quadTop2).agg(sum("top2")).collect()
      }
      time(s"top2 run-length       $tag") {
        top2Frame(docs, runLenTop2).agg(sum("top2")).collect()
      }
      time(s"ngramRepetition full  $tag") {
        Curation.ngramRepetition(docs).agg(sum("top2"), sum("d3")).collect()
      }
      time(s"contam 8-gram explode $tag") {
        docs.select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
          .select(col("doc_id"), explode(expr(Curation.gramArrayExpr(8))).as("gram"))
          .select(expr("xxhash64(gram)").as("gh")).agg(bit_xor(col("gh"))).collect()
      }
    }
    spark.stop()
  }
}
