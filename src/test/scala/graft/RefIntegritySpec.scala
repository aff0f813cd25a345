package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RefIntegrity

/** FK audit: planted orphans (incl. NULL keys), clean gate tables, and
  * key-only pruned scans.
  */
class RefIntegritySpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: orphan and NULL child keys counted, match ppm exact") {
    import spark.implicits._
    val child = Seq(Option(1L), Option(1L), Option(99L), None)
      .toDF("c_nationkey")
    val parent = Seq(1L, 2L).toDF("n_nationkey")
    import org.apache.spark.sql.functions.{col, count, lit, expr}
    // drive just one edge through the private shape via the public API:
    // reuse refIntegrity with minimal frames for the customer->nation edge
    val empty = spark.emptyDataFrame
    val li = Seq((1L, 1L, 1L)).toDF("l_orderkey", "l_partkey", "l_suppkey")
    val orders = Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
    val cust = child.withColumn("c_custkey", lit(1L))
    val part = Seq(Tuple1(1L)).toDF("p_partkey")
    val supp = Seq((1L, 1L)).toDF("s_suppkey", "s_nationkey")
    val out = RefIntegrity.refIntegrity(li, orders, cust, part, supp, parent)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // 4 customers: orphans = key 99 and the NULL key → 2; ppm = 500000
    assert(out("customer->nation") == ((4L, 2L, 500000L)))
    assert(out("lineitem->orders") == ((1L, 0L, 1000000L)))
    assert(out.size == 6)
  }

  test("gate tables: the synthetic star is referentially clean") {
    val out = RefIntegrity.refIntegrity(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf)).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getLong(2) == 0L, s"${r.getString(0)} has orphans")
      assert(r.getLong(3) == 1000000L)
      assert(r.getLong(1) > 0L)
    }
  }

  test("plan: every child scan reads only its key column") {
    val plan = RefIntegrity.refIntegrity(
      Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf))
      .queryExecution.executedPlan.toString
    val lineitemScans = plan.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("lineitem")).toSeq
    assert(lineitemScans.nonEmpty)
    lineitemScans.foreach { l =>
      assert(!l.contains("l_extendedprice") && !l.contains("l_shipdate"),
        s"unpruned lineitem scan: $l")
    }
  }
}
