package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoverageAudit

/** Coverage audit: planted childless-parent arithmetic, a full Scala
  * recount of every edge on the gate star, and key-only pruned scans.
  */
class CoverageAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: childless parents counted once each, duplicate children don't help") {
    import spark.implicits._
    val customer = Seq((1L, 0), (2L, 0), (3L, 0)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("o_orderkey", "o_custkey")
    val nation = Seq((0, "X")).toDF("n_nationkey", "n_name")
    val li = Seq.empty[(Long, Long, Long)].toDF("l_orderkey", "l_partkey", "l_suppkey")
    val part = Seq.empty[(Long, String)].toDF("p_partkey", "p_name")
    val supplier = Seq.empty[(Long, Int)].toDF("s_suppkey", "s_nationkey")
    val out = CoverageAudit.coverageAudit(li, orders, customer, part, supplier, nation)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // customer 2 is childless; 1 has two orders but counts once
    assert(out("customer<-orders") == ((3L, 1L, 666666L)))
    assert(out("nation<-customer") == ((1L, 0L, 1000000L)))
    assert(out("nation<-supplier") == ((1L, 1L, 0L)))
    assert(out("orders<-lineitem") == ((3L, 3L, 0L)))
  }

  test("gate: every edge recounts from plain Scala key sets") {
    def keys(t: String, c: String): Set[Long] =
      Tables.load(spark, sf, t).selectExpr(s"CAST($c AS BIGINT)")
        .collect().map(_.getLong(0)).toSet
    def parents(t: String, c: String): Seq[Long] =
      Tables.load(spark, sf, t).selectExpr(s"CAST($c AS BIGINT)")
        .collect().map(_.getLong(0)).toSeq
    val edges = Seq(
      ("customer<-orders", parents("customer", "c_custkey"), keys("orders", "o_custkey")),
      ("nation<-customer", parents("nation", "n_nationkey"), keys("customer", "c_nationkey")),
      ("nation<-supplier", parents("nation", "n_nationkey"), keys("supplier", "s_nationkey")),
      ("orders<-lineitem", parents("orders", "o_orderkey"), keys("lineitem", "l_orderkey")),
      ("part<-lineitem", parents("part", "p_partkey"), keys("lineitem", "l_partkey")),
      ("supplier<-lineitem", parents("supplier", "s_suppkey"), keys("lineitem", "l_suppkey")))
    val expected = edges.map { case (name, ps, cs) =>
      val childless = ps.count(p => !cs.contains(p)).toLong
      (name, ps.size.toLong, childless,
        (ps.size - childless) * 1000000L / math.max(ps.size.toLong, 1L))
    }
    val out = CoverageAudit.coverageAudit(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out == expected)
    // non-vacuous on the gate star: some orders have no lineitem
    assert(out.exists(_._3 > 0))
  }

  test("plan: child scans prune to the single key column") {
    val plan = CoverageAudit.coverageAudit(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf), Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint>"), plan.take(1200))
  }
}
