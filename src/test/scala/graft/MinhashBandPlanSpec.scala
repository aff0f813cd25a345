package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Lsh, MinhashBandPlan}

/** The S-curve banding advisor, checked against a transparent in-test
  * integer reference (same ppm folds), plus the plan-as-data loop and
  * the gate-corpus recall statement. */
class MinhashBandPlanSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** The operator's own integer arithmetic on one j_ppm. */
  private def collRef(jPpm: Long, b: Int, r: Int): Long = {
    def pow(x: Long, n: Int): Long = (2 to n).foldLeft(x)((a, _) => a * x / 1000000L)
    1000000L - pow(1000000L - pow(jPpm, r), b)
  }

  test("planted near-dup pair: every factorization row matches the integer reference") {
    // 11-word docs differing in the last word: 10 distinct bigrams each,
    // 9 shared -> j = 9/11, j_ppm = 818181; qualifies at tau = 4/5
    // (9*(4+5) = 81 >= 4*20 = 80)
    val words = (0 until 11).map(i => s"w$i")
    val a = words.mkString(" ")
    val b = (words.dropRight(1) :+ "zz").mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = MinhashBandPlan.minhashBandPlan(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getBoolean(7))).toMap
    assert(got.keySet == MinhashBandPlan.Factorizations
      .map { case (bb, rr) => (bb.toLong, rr.toLong) }.toSet)
    val j = 9L * 1000000L / 11L
    val okBands = MinhashBandPlan.Factorizations
      .filter { case (bb, rr) => collRef(j, bb, rr) >= MinhashBandPlan.RecallFloorPpm }
      .map(_._1)
    assert(okBands.nonEmpty, "fixture should clear the floor somewhere")
    val bestBands = okBands.min.toLong
    MinhashBandPlan.Factorizations.foreach { case (bb, rr) =>
      val (n, mn, mean, fp50, fp20, rec) = got((bb.toLong, rr.toLong))
      assert(n == 1L)
      assert(mn == collRef(j, bb, rr) && mean == mn,
        s"($bb,$rr): $mn vs ref ${collRef(j, bb, rr)}")
      assert(fp50 == collRef(500000L, bb, rr) && fp20 == collRef(200000L, bb, rr))
      assert(rec == (mn >= MinhashBandPlan.RecallFloorPpm && bb.toLong == bestBands),
        s"recommended flag wrong at ($bb,$rr)")
    }
    // sharper bands must not collide MORE junk: fp falls as r grows
    val fps = MinhashBandPlan.Factorizations.map { case (bb, rr) => got((bb.toLong, rr.toLong))._4 }
    assert(fps == fps.sorted.reverse, s"fp_at_j50 must fall with rows/band: $fps")
  }

  test("gate corpus: mining at the recommended geometry equals the exact pair set") {
    // the advisor certifies >= 99.9% per-pair collision at the
    // recommended banding; the hash family is FIXED, so on this corpus
    // the claim either holds forever or fails loudly here (the
    // minhash-oracle argument in AnnOracleSpec) — and the plan survives
    // the parquet round-trip (the plan-as-data loop)
    val docs = Tables.documents(spark, sf)
    val plan = MinhashBandPlan.minhashBandPlan(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_mbp").toString
    plan.write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    val (b, r) = MinhashBandPlan.geometryFromPlan(persisted)
    assert(b * r <= Lsh.MinhashK && b >= 1 && r >= 2, s"odd geometry ($b,$r)")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id1", "id2").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val exact = pairs(Dedup.ngramJaccardPairs(docs))
    val planned = pairs(MinhashBandPlan.minhashLshPairsPlanned(docs, persisted))
    assert(exact.nonEmpty && planned == exact,
      s"missing=${(exact -- planned).take(3)} extra=${(planned -- exact).take(3)}")
    // and the planned form is literally the parameterized miner
    assert(pairs(Lsh.minhashLshPairs(docs, bands = b, rows = r)) == planned)
  }

  test("empty corpus: zero report rows (grouped-by-literal totality)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(MinhashBandPlan.minhashBandPlan(empty).count() == 0)
  }
}
