package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomSizing, KeySkew, SaltingPlan}

/** Salting plan + Bloom sizing: planted ceiling arithmetic, hot-set
  * agreement with key_skew (one rule), and formula recounts.
  */
class SaltingBloomSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salting_plan planted: ceil division, the parts cap, cold keys absent") {
    import spark.implicits._
    // key 1: 60 of 100 rows → at parts=8: ceil(60*8/100)=5; 12 rows/task
    // key 2: 30 rows → 2.4x mean (hot) → ceil(240/100)=3
    // keys 3..12: 1 row each (cold, absent)
    val df = (Seq.fill(60)(1L) ++ Seq.fill(30)(2L) ++ (3L to 12L)).toDF("k")
    val out = SaltingPlan.saltingPlan(df, col("k"), parts = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 60L, 5L, 12L), (2L, 30L, 3L, 10L)))
  }

  test("salting_plan planted: a mega-key caps at parts") {
    import spark.implicits._
    val df = (Seq.fill(99)(1L) ++ Seq(2L, 3L, 4L)).toDF("k")
    val out = SaltingPlan.saltingPlan(df, col("k"), parts = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(out.head == ((1L, 8L))) // ceil(99*8/102)=8 → capped at parts anyway
  }

  test("salting_plan gate: exactly key_skew's hot set, salts in [2, parts]") {
    val li = Tables.lineitem(spark, sf)
    val hot = KeySkew.keySkewReport(li, col("l_orderkey")).collect()
      .filter(_.getBoolean(4)).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = SaltingPlan.saltingPlan(li, col("l_orderkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == hot.keySet)
    out.foreach { case (k, n, s) =>
      assert(hot(k) == n)
      assert(s >= 1 && s <= SaltingPlan.PlanParts, s"salt out of range: $k -> $s")
    }
  }

  test("bloom_sizing gate: distinct recounts and the milli-bit formula") {
    val li = Tables.lineitem(spark, sf)
    val od = Tables.orders(spark, sf)
    val nd = Map(
      "l_orderkey" -> li.select("l_orderkey").distinct().count(),
      "l_partkey" -> li.select("l_partkey").distinct().count(),
      "l_suppkey" -> li.select("l_suppkey").distinct().count(),
      "o_custkey" -> od.select("o_custkey").distinct().count())
    val out = BloomSizing.bloomSizingReportQ(li, od).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.length == nd.size * BloomSizing.Fpps.size)
    out.foreach { case (k, n, p, bits, bytes, h) =>
      assert(n == nd(k), k)
      val (_, mb, hh) = BloomSizing.Fpps.find(_._1 == p).get
      assert(bits == n * mb / 1000 && bytes == (bits + 7) / 8 && h == hh, k)
    }
  }
}
