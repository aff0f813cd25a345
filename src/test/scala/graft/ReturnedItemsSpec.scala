package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ReturnedItems

/** Q10 returned items: planted flag/window semantics, a gate recount,
  * and the pushed-filter + top-K plan shape.
  */
class ReturnedItemsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: only R-flag lines in windowed orders count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li = Seq(
      (1L, "R", 100.0, 0.0), (1L, "N", 999.0, 0.0),  // N ignored
      (2L, "R", 50.0, 0.0),                          // order outside window
      (3L, "R", 30.0, 0.5))                          // 1500 cents after discount
      .toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val orders = Seq(
      (1L, 10L, "1997-02-01 00:00:00"), (2L, 10L, "1996-01-01 00:00:00"),
      (3L, 20L, "1997-06-30 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp"))
    val customer = Seq((10L, "alice", 1), (20L, "bob", 1))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val nation = Seq((1, "FR")).toDF("n_nationkey", "n_name")
    val out = ReturnedItems.q10ReturnedTopKQ(li, orders, customer, nation)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (10L, "alice", "FR", 10000L, 1L),
      (20L, "bob", "FR", 1500L, 1L)))
  }

  test("gate: full Scala recount of the top-K") {
    val li = Tables.lineitem(spark, sf)
    val flagged = li.selectExpr("l_orderkey", "l_returnflag",
      "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
      .collect().filter(_.getString(1) == "R")
      .map(r => (r.getLong(0), r.getLong(2)))
    val win = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP))").collect()
      .filter(r => r.getLong(2) >= ReturnedItems.WindowStartUs &&
        r.getLong(2) < ReturnedItems.WindowEndUs)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = flagged.filter(t => win.contains(t._1))
      .map { case (ok, c) => (win(ok), c) }
      .groupBy(_._1).map { case (ck, vs) => (ck, vs.map(_._2).sum, vs.length.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(ReturnedItems.TopK)
    val out = ReturnedItems.q10ReturnedTopKQ(li, Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.nation(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(out == expected)
  }

  test("plan: flag filter reaches the scan; top-K is TakeOrderedAndProject") {
    val plan = ReturnedItems.q10ReturnedTopKQ(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.nation(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(l_returnflag,R)"), plan.take(1500))
  }
}
