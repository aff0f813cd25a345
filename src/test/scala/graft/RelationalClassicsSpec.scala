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
}
