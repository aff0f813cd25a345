package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TpchGaps

/** The round-10 classics' planted semantics: Q21's sole-late verdicts
  * (tie and single-supplier exclusions), Q12's exact bucket boundaries,
  * Q11's mean-cut, Q2's min-cost tie. Cross-engine equality is the
  * oracle's job; these pin the SEMANTICS the shapes must keep. */
class TpchGapsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def li(rows: Seq[(Long, Long, Long, Double, Double, Double, String)]) =
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "ship")
      .withColumn("l_shipdate", expr("CAST(ship AS TIMESTAMP)")).drop("ship")

  test("q21: strictly-last supplier only — ties and single-supplier orders excluded") {
    val l = li(Seq(
      (1L, 1L, 1L, 1.0, 10.0, 0.0, "2020-01-10"), // O1: S1 ships day 10
      (1L, 1L, 2L, 1.0, 10.0, 0.0, "2020-01-20"), // O1: S2 last -> sole-late
      (2L, 1L, 1L, 1.0, 10.0, 0.0, "2020-01-05"), // O2: single supplier -> none
      (3L, 1L, 1L, 1.0, 10.0, 0.0, "2020-01-30"), // O3: tie at max -> none
      (3L, 1L, 2L, 1.0, 10.0, 0.0, "2020-01-30")))
    val sup = Seq((1L, "S#1", 0L, 0.0), (2L, "S#2", 0L, 0.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val got = TpchGaps.q21SoleDelay(l, sup).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 1L)), s"sole-late verdicts: ${got.toSeq}")
  }

  test("q12: delay bucket boundaries are exact (30 in, 31 next, 61 last)") {
    val l = li(Seq(
      (1L, 1L, 1L, 1.0, 10.0, 0.0, "2020-01-31"), // 30 days after O1 date
      (2L, 1L, 1L, 1.0, 10.0, 0.0, "2020-02-01"), // 31 days
      (3L, 1L, 1L, 1.0, 10.0, 0.0, "2020-03-02"))) // 61 days
    val o = Seq(
      (1L, "2020-01-01", "1-URGENT"), (2L, "2020-01-01", "5-LOW"),
      (3L, "2020-01-01", "2-HIGH"))
      .toDF("l_orderkey2", "od", "o_orderpriority")
      .withColumn("o_orderdate", expr("CAST(od AS TIMESTAMP)"))
      .withColumnRenamed("l_orderkey2", "o_orderkey").drop("od")
    val got = TpchGaps.q12ShipDelay(l, o).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("0-30", 1L, 0L), ("31-60", 0L, 1L), ("61+", 1L, 0L)),
      s"buckets: $got")
  }

  test("q11: the >= mean cut keeps everything on an all-equal corpus, prunes under skew") {
    val equal = li((1L to 4L).map(k => (k, k, 1L, 1.0, 10.0, 0.0, "2020-01-01")))
    assert(TpchGaps.q11ImportantParts(equal).count() == 4,
      "all-equal parts must ALL sit at the mean")
    val skew = li(Seq(
      (1L, 1L, 1L, 1.0, 100.0, 0.0, "2020-01-01"),
      (2L, 2L, 1L, 1.0, 1.0, 0.0, "2020-01-01"),
      (3L, 3L, 1L, 1.0, 1.0, 0.0, "2020-01-01")))
    val kept = TpchGaps.q11ImportantParts(skew).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L), s"skewed corpus kept: $kept")
  }

  test("q6: midpoint discount band decides the hundredths grid exactly; quantity cap strict") {
    val l = li(Seq(
      (1L, 1L, 1L, 1.0, 100.0, 0.04, "1996-06-01"),  // below band -> out
      (2L, 1L, 1L, 1.0, 100.0, 0.05, "1996-06-01"),  // band edge -> in (5c)
      (3L, 1L, 1L, 1.0, 100.0, 0.07, "1996-06-01"),  // band edge -> in (7c)
      (4L, 1L, 1L, 1.0, 100.0, 0.08, "1996-06-01"),  // above band -> out
      (5L, 1L, 1L, 24.0, 100.0, 0.06, "1996-06-01"), // qty 24 -> out (strict <)
      (6L, 1L, 1L, 23.0, 100.0, 0.06, "1996-06-01"), // qty 23 -> in (6c)
      (7L, 1L, 1L, 1.0, 100.0, 0.06, "1995-12-31"))) // before window -> out
    val got = TpchGaps.q6ForecastRevenue(l).collect()(0)
    assert((got.getLong(0), got.getLong(1)) == (500L + 700L + 600L, 3L),
      s"q6 verdicts: $got")
  }

  test("q20: strict-majority supplier only — 50/50 tie excluded, sole supplier included") {
    val l = li(Seq(
      (1L, 1L, 1L, 6.0, 10.0, 0.0, "1996-06-01"),  // part 1: S1 ships 6
      (2L, 1L, 2L, 4.0, 10.0, 0.0, "1996-06-01"),  // part 1: S2 ships 4 -> S1 majority
      (3L, 2L, 1L, 5.0, 10.0, 0.0, "1996-06-01"),  // part 2: exact 50/50 -> neither
      (4L, 2L, 2L, 5.0, 10.0, 0.0, "1996-06-01"),
      (5L, 3L, 3L, 1.0, 10.0, 0.0, "1996-06-01"),  // part 3: sole supplier -> majority
      (6L, 4L, 2L, 9.0, 10.0, 0.0, "1995-06-01"))) // part 4: outside window -> ignored
    val part = (1L to 4L).map(k => (k, "steel rod", "B", "STANDARD", 10, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val sup = Seq((1L, "S#1", 11), (2L, "S#2", 11), (3L, "S#3", 11))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nat = Seq((11L, "NATION_11", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
    val got = TpchGaps.q20PartPromotion(l, part, sup, nat).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L), s"majority suppliers: $got")
  }

  test("q2: min unit cost wins per part; exact-cents tie keeps both suppliers") {
    val l = li(Seq(
      (1L, 1L, 1L, 2.0, 10.0, 0.0, "2020-01-01"),  // unit 500c
      (2L, 1L, 2L, 1.0, 7.0, 0.0, "2020-01-01"),   // unit 700c
      (3L, 2L, 1L, 1.0, 3.0, 0.0, "2020-01-01"),   // part 2: tie 300c
      (4L, 2L, 2L, 2.0, 6.0, 0.0, "2020-01-01")))
    val part = Seq((1L, "p1", "B", "STANDARD", 40, 1.0), (2L, "p2", "B", "STANDARD", 45, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    val sup = Seq((1L, "S#1", 0L, 5.0), (2L, "S#2", 0L, 9.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val nat = Seq((0L, "N", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
    val got = TpchGaps.q2MinCostSupplier(l, part, sup, nat).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(6))).toSet
    assert(got == Set((1L, 1L, 500L), (2L, 1L, 300L), (2L, 2L, 300L)),
      s"min-cost verdicts: $got")
  }
}
