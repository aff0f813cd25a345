package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ZIPF CONFORMANCE check (round 13) — the rank-frequency diagnostic
  * completing the vocabulary-statistics pair: [[VocabGrowth]] reads the
  * Heaps curve (how the vocabulary GROWS), this reads the Zipf curve
  * (how mass DISTRIBUTES over ranks). Natural corpora follow
  * f(r) ∝ 1/r^s with s ≈ 1; heavy deviation flags synthetic text,
  * template spam, or a broken tokenizer — a standard corpus-health
  * probe (Zipf 1949, public). Log-free §6 form: for probe ranks
  * r ∈ {1, 2, 4, …, 64}, the DOUBLING RATIO `f(r)·10⁶ div f(2r)` —
  * under exact Zipf s=1 every ratio is 2.0 (2,000,000 ppm), and the
  * per-rank deviation localizes WHERE the curve bends (head
  * boilerplate vs tail noise) the way a single fitted slope cannot.
  * `s` itself is recoverable offline as log2(ratio), but no log enters
  * the engine or the oracle.
  *
  * Determinism: ranks are row_number over the total (freq DESC, term)
  * order, so ties cannot reorder probe rows. Sparse emission: a rank
  * pair is emitted only when rank 2r exists.
  *
  * Scale: ONE data-volume stage (the inline-exploded unigram count —
  * the vocab_build shape). The vocabulary is CORPUS-scale, not catalog
  * (vocab_build deliberately uses TakeOrderedAndProject on this same
  * frame), so the rank window must never see the full frame: a
  * `limit(2·maxProbe)` over the (f DESC, term) total order runs as
  * TakeOrderedAndProject (per-partition top-N + driver merge — no
  * global sort, no single-partition WindowExec), and row_number then
  * ranks the 128-row survivor frame. Identical ranks by construction:
  * the limit keeps exactly the first 2·maxProbe rows of the SAME total
  * order the window ranks by. PlanShapeSpec pins the TakeOrdered shape
  * on the pre-checkpoint plan (round 14 — the r13 verdict's note that
  * the checkpoint hid this frame from every Explain sweep). The probe
  * self-join is |probes|-sized. */
object ZipfCheck {

  /** Probe ranks: powers of two so each row's twin is the next row. */
  val ProbeRanks: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L)

  private val tokExpr =
    "filter(split(lower(trim(coalesce(text, ''))), '\\\\s+'), t -> t <> '')"

  /** Top-(2·maxProbe) terms RANKED — the pre-checkpoint frame, exposed so
    * PlanShapeSpec can pin the TakeOrderedAndProject shape the registered
    * query's checkpoint would otherwise hide. */
  private[graft] def rankedProbes(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(explode(expr(tokExpr)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))
    // TakeOrderedAndProject over the corpus-scale vocab; the unpartitioned
    // window below then ranks ≤ 2·maxProbe rows (see scaladoc)
    val top = tf.orderBy(col("f").desc, col("term"))
      .limit((2L * ProbeRanks.max).toInt)
    val byRank = Window.orderBy(col("f").desc, col("term"))
    top
      .withColumn("r", row_number().over(byRank).cast("long"))
      .filter(col("r").isin((ProbeRanks ++ ProbeRanks.map(_ * 2)).distinct: _*))
  }

  def zipfCheck(documents: DataFrame): DataFrame = {
    val ranked = rankedProbes(documents)
      .localCheckpoint() // 2 consumers: both sides of the doubling join
    ranked.filter(col("r").isin(ProbeRanks: _*))
      .select(col("r").as("rank"), col("term"), col("f"))
      .join(ranked.filter(col("r") % 2 === 0)
        .select(expr("r div 2").as("rank"), col("f").as("f2")), Seq("rank"))
      .select(col("rank"), col("term"), col("f").as("freq"),
        col("f2").as("freq_at_2r"),
        expr("f * 1000000 div f2").as("doubling_ratio_ppm"))
  }

  def zipfCheckQ(documents: DataFrame): DataFrame =
    zipfCheck(documents).orderBy("rank")

  val zipfCheckSql: String = {
    val probes = ProbeRanks.mkString(", ")
    val both = (ProbeRanks ++ ProbeRanks.map(_ * 2)).distinct.sorted.mkString(", ")
    s"""WITH tf AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(trim(COALESCE(text, ''))), '\\s+'),
       |                t -> t <> '')) AS term
       |  FROM documents
       |), cnt AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS f FROM tf GROUP BY 1
       |), ranked AS (
       |  SELECT term, f,
       |         CAST(row_number() OVER (ORDER BY f DESC, term) AS BIGINT) AS r
       |  FROM cnt
       |), probes AS (
       |  SELECT * FROM ranked WHERE r IN ($both)
       |)
       |SELECT a.r AS rank, a.term, a.f AS freq, b.f AS freq_at_2r,
       |       a.f * 1000000 // b.f AS doubling_ratio_ppm
       |FROM probes a JOIN probes b ON b.r = a.r * 2
       |WHERE a.r IN ($probes)
       |ORDER BY rank""".stripMargin
  }
}
