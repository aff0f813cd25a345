package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LargeOrders

/** Q18 large orders: planted threshold boundary, a full Scala recount
  * on the gate star, and the aggregate-then-join plan shape.
  */
class LargeOrdersSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: inclusive threshold; reduction happens before the join") {
    import spark.implicits._
    val li = Seq(
      (1L, 150.0), (1L, 100.0),   // order 1: 2500 deci — exactly at cut: IN
      (2L, 249.9),                // order 2: 2499 — out
      (3L, 300.0))                // order 3: 3000 — in
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq((1L, 10L, 11.0), (2L, 10L, 12.0), (3L, 20L, 13.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((10L, "alice"), (20L, "bob")).toDF("c_custkey", "c_name")
    val out = LargeOrders.q18LargeOrdersQ(li, orders, customer).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 10L, "alice", 2500L, 2L, 1100L),
      (3L, 20L, "bob", 3000L, 1L, 1300L)))
  }

  test("gate: full Scala recount of the heavy-order set") {
    val li = Tables.lineitem(spark, sf)
    val qd = li.selectExpr("l_orderkey", "CAST(round(l_quantity * 10.0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val heavy = qd.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.map(_._2).sum, vs.length.toLong)) }
      .filter(_._2._1 >= LargeOrders.MinQtyDeci)
    val out = LargeOrders.q18LargeOrdersQ(li, Tables.orders(spark, sf),
      Tables.customer(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq == heavy.keys.toSeq.sorted)
    out.foreach { r => assert(heavy(r._1) == ((r._2, r._3)), r) }
    assert(out.nonEmpty) // non-vacuous threshold on the gate star
  }

  test("plan: HAVING cut riding the orderkey agg, customer broadcast, no window") {
    val plan = LargeOrders.q18LargeOrdersQ(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
