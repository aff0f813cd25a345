package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BandPlan, Dedup, PrefixJoin}

/** prefix_band_plan — the df-band calibrator: exactly one recommendation,
  * exact cost algebra, a data-derived band on a hot corpus, and (the
  * verdict's "done" bar) the recommendation fed back into
  * [[PrefixJoin.hybridJaccardPairs]] row-identical to the exact form. */
class BandPlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("gate corpus: one recommendation; feeding it back is row-identical to the exact join") {
    val plan = BandPlan.prefixBandPlan(docs).collect()
    assert(plan.nonEmpty, "gate corpus produced no candidate bands")
    assert(plan.count(_.getInt(6) == 1) == 1, "recommended flag not unique")
    val band = BandPlan.recommendedBand(docs)
    assert(plan.filter(_.getInt(6) == 1).map(_.getLong(0)).toSeq == Seq(band))
    val exact = Dedup.ngramJaccardQ(docs).collect().toSeq
    val atBand = PrefixJoin.hybridJaccardPairs(docs, dfBand = band)
      .select(col("id1"), col("id2"), col("n1"), col("n2"), col("inter"),
        graft.operators.Parity.r("jaccard", 4))
      .orderBy("id1", "id2").collect().toSeq
    assert(exact.nonEmpty, "no pairs at gate SF — identity test is vacuous")
    assert(atBand == exact, s"recommended band $band diverges from the exact join")
  }

  test("cost algebra: partition + boundary identities hold on every row") {
    val rows = BandPlan.prefixBandPlan(docs).orderBy("band").collect()
    val ex = Dedup.shingleExploded(docs)
    val dfs = ex.groupBy("s").agg(count(lit(1)).as("df")).localCheckpoint()
    val totalSh = dfs.count()
    val totalPost = dfs.agg(sum("df")).collect()(0).getLong(0)
    val totalPairs = dfs.agg(sum(expr("(df * (df - 1)) div 2")))
      .collect()(0).getLong(0)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == totalSh,
        s"band ${r.getLong(0)}: cold+hot shingles != total")
      assert(r.getLong(5) == r.getLong(3) + BandPlan.HotProbeCostFactor * r.getLong(4),
        s"band ${r.getLong(0)}: est_cost text drifted from the model")
    }
    val maxDf = dfs.agg(max("df")).collect()(0).getLong(0)
    assert(maxDf <= BandPlan.BandCap, "gate corpus hotter than the cap — fixture drifted")
    val top = rows.last
    assert(top.getLong(0) == maxDf && top.getLong(4) == 0L && top.getLong(2) == 0L,
      "max-band row should have no hot mass")
    assert(top.getLong(3) == totalPairs, "max-band cold mass != full candidate mass")
    // monotonicity: cold mass grows, hot postings shrink, as the band rises
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) <= b.getLong(3) && a.getLong(4) >= b.getLong(4))
      case _ => ()
    }
  }

  test("hot corpus: the calibrator cuts below the boilerplate shingle; identity still exact") {
    // 40 docs sharing one boilerplate bigram (df 40) + one true near-dup
    // pair (J = 9/11): the hot shingle's C(40,2) pair mass dwarfs the
    // probe-cost of its 40 postings, so the recommended band must cut
    // BELOW df=40 — the hot branch engages — while the pair answer is
    // unchanged.
    val words = (1 to 11).map(i => s"w$i")
    val fix = ((0 until 40).map(i => (i.toLong, s"common token u$i v$i w$i")) ++
      Seq((100L, words.mkString(" ")),
        (101L, (words.dropRight(1) :+ "zz").mkString(" "))))
      .toDF("doc_id", "text")
    val plan = BandPlan.prefixBandPlan(fix).orderBy("band").collect()
    val maxDf = plan.last.getLong(0)
    assert(maxDf == 40L, s"fixture df drifted: $maxDf")
    val band = BandPlan.recommendedBand(fix)
    assert(band < 40L, s"calibrator kept the boilerplate shingle cold (band $band)")
    val exact = Dedup.ngramJaccardPairs(fix)
      .select("id1", "id2", "inter").orderBy("id1", "id2").collect().toSeq
    val atBand = PrefixJoin.hybridJaccardPairs(fix, dfBand = band)
      .select("id1", "id2", "inter").orderBy("id1", "id2").collect().toSeq
    assert(exact.size == 1 && atBand == exact,
      s"hot-corpus identity broke: $atBand vs $exact")
  }

  test("diffuse corpus recommends max df (the all-cold plain-join plan)") {
    // dfs are 1 and 2 only: cost(2) = dup-pair mass, cost(1) = 8x the
    // duplicated postings — the plain join wins, band = max df, which is
    // exactly hybridJaccardPairs' all-cold LIMIT-1 fast path.
    val fix = ((0 until 30).map(i => (i.toLong, s"a$i b$i c$i d$i")) ++
      (0 until 3).map(i => (100L + i, s"dup$i text$i here$i now$i")) ++
      (0 until 3).map(i => (200L + i, s"dup$i text$i here$i now$i")))
      .toDF("doc_id", "text")
    val band = BandPlan.recommendedBand(fix)
    val maxDf = BandPlan.prefixBandPlan(fix).agg(max("band")).collect()(0).getLong(0)
    assert(band == maxDf && maxDf == 2L, s"diffuse corpus: band $band, max df $maxDf")
  }

  test("empty corpus: empty plan, fallback band is the documented constant") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(BandPlan.prefixBandPlan(empty).collect().isEmpty)
    assert(BandPlan.recommendedBand(empty) == Dedup.HotDfFloor)
  }
}
