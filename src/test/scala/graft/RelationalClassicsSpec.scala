package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DisjunctiveJoin, PromoShare}

/** Q14 promo share + Q19 disjunctive: planted conditional-share and
  * branch-boundary arithmetic, gate recounts, and the residual-on-one-
  * hash-join plan shape.
  */
class RelationalClassicsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q14 planted: promo flag decides the numerator per month") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li = Seq(
      (1L, "1997-01-05 00:00:00", 100.0, 0.0),
      (2L, "1997-01-20 00:00:00", 300.0, 0.0),
      (1L, "1997-02-01 00:00:00", 50.0, 0.0))
      .toDF("l_partkey", "ship", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val out = PromoShare.q14PromoShareQ(li, part).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (199701L, 40000L, 10000L, 250000L),
      (199702L, 5000L, 5000L, 1000000L)))
  }

  test("q14 gate: recount from plain Scala") {
    val li = Tables.lineitem(spark, sf)
    val promo = Tables.part(spark, sf).select("p_partkey", "p_type").collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "PROMO")).toMap
    val rows = li.selectExpr("l_partkey",
      "CAST(year(CAST(l_shipdate AS TIMESTAMP)) * 100 + month(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)",
      "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
      .collect().map(r => (r.getLong(1), r.getLong(2), promo(r.getLong(0))))
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (m, rs) =>
      val tot = rs.map(_._2).sum
      val p = rs.filter(_._3).map(_._2).sum
      (m, tot, p, p * 1000000L / math.max(tot, 1L))
    }
    val out = PromoShare.q14PromoShareQ(li, Tables.part(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == expected)
  }

  test("q19 planted: inclusive bands, wrong-brand and out-of-band excluded") {
    import spark.implicits._
    val li = Seq(
      (1L, 1.0, 100.0, 0.0),    // b2, qd=10 — at lower bound: IN
      (1L, 11.0, 200.0, 0.0),   // b2, qd=110 — at upper bound: IN
      (1L, 12.0, 999.0, 0.0),   // qd=120 — out of b2's band
      (2L, 11.0, 999.0, 0.0),   // brand 15 but size out of band via part row
      (3L, 15.0, 400.0, 0.0))   // b15, qd=150: IN
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Seq((1L, "Brand#2", 5), (2L, "Brand#15", 25), (3L, "Brand#15", 10))
      .toDF("p_partkey", "p_brand", "p_size")
    val out = DisjunctiveJoin.q19DisjunctiveQ(li, part).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("mid_b15", 1L, 40000L), ("small_b2", 2L, 30000L)))
  }

  test("q19 gate: recount + residual-on-one-hash-join plan (part OR pushed)") {
    val li = Tables.lineitem(spark, sf)
    val pt = Tables.part(spark, sf)
    val pinfo = pt.select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val rows = li.selectExpr("l_partkey", "CAST(round(l_quantity * 10.0) AS BIGINT)",
      "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = rows.flatMap { case (pk, qd, c) =>
      val (b, sz) = pinfo(pk)
      DisjunctiveJoin.Branches.find { case (_, br, slo, shi, qlo, qhi) =>
        b == br && sz >= slo && sz <= shi && qd >= qlo && qd <= qhi
      }.map(br => (br._1, c))
    }.groupBy(_._1).map { case (l, cs) => (l, cs.length.toLong, cs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val out = DisjunctiveJoin.q19DisjunctiveQ(li, pt).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expected)
    val plan = DisjunctiveJoin.q19DisjunctiveQ(li, pt)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert("Scan parquet".r.findAllIn(plan).size == 2, plan.take(800))
    // the part-side brand/size OR reaches its scan as a pushed filter
    assert(plan.contains("EqualTo(p_brand,Brand#2)") && plan.contains("Or("),
      plan.take(2000))
  }

  test("q13 planted: zero-order customers land in the zero bucket") {
    import spark.implicits._
    val cust = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
    val out = graft.operators.CustDistribution.q13CustDistQ(cust, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // two customers with no orders, one with 1, one with 2; ordering
    // custdist DESC then c_count DESC
    assert(out == Seq((0L, 2L), (2L, 1L), (1L, 1L)))
  }

  test("q13 gate: histogram masses recount and cover every customer") {
    val out = graft.operators.CustDistribution
      .q13CustDistQ(Tables.customer(spark, sf), Tables.orders(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._2).sum == Tables.customer(spark, sf).count(),
      "histogram must partition the customer set")
    val orderMass = out.map { case (c, n) => c * n }.sum
    assert(orderMass == Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey")).count(),
      "Σ count·custdist must equal the joined order mass")
  }

  test("q22 planted: integer cross-product cut; recency (not lifetime) decides the anti join") {
    import spark.implicits._
    // positive balances 10.00 and 20.00 → avg 15.00; negative ignored in
    // the average but still below the cut; cust 2 (20.00) is above but
    // ordered RECENTLY → excluded; cust 4 (30.00) is above and its only
    // order predates the cutoff → KEPT (the recency semantics — a
    // lifetime anti join would drop it)
    val cust = Seq(
      (1L, 7L, 10.00), (2L, 7L, 20.00), (3L, 8L, -5.00), (4L, 8L, 30.00))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val ord = Seq((100L, 2L, "1999-01-01"), (101L, 4L, "1996-05-05"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val out = graft.operators.CustDistribution.q22NoOrderCustsQ(cust, ord).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((8L, 1L, 3000L)))
    // boundary: bal exactly equal to the average is NOT above it
    val cust2 = Seq((1L, 7L, 10.00), (2L, 7L, 20.00), (5L, 9L, 15.00))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val out2 = graft.operators.CustDistribution
      .q22NoOrderCustsQ(cust2, ord).collect()
    assert(!out2.exists(_.getLong(0) == 9L), "avg-equal balance leaked past the strict cut")
  }

  test("q22 gate: non-vacuous at gate scale and recounted from plain Scala") {
    import org.apache.spark.sql.functions._
    // driver-gate SF: at sf0.001 every customer has a recent order, so
    // the non-vacuity claim lives where the gate actually runs
    val sf = "/root/testdata/sf0.01"
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT) AS c_nationkey",
        "CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pos = cust.map(_._3).filter(_ > 0)
    val (n, s) = (pos.length.toLong, pos.sum)
    val recent = Tables.orders(spark, sf)
      .filter(expr(s"CAST(o_orderdate AS DATE) >= DATE '${graft.operators.CustDistribution.RecencyCutoff}'"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expected = cust.filter(c => c._3 * n > s && !recent(c._1))
      .groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (nk, cs) => (nk, cs.length.toLong, cs.map(_._3).sum) }
    val out = graft.operators.CustDistribution
      .q22NoOrderCustsQ(Tables.customer(spark, sf), Tables.orders(spark, sf))
      .selectExpr("CAST(c_nationkey AS BIGINT)", "numcust", "totacctbal_cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expected)
    assert(out.nonEmpty, "q22 vacuous at gate scale — cutoff needs re-planting")
  }
}
