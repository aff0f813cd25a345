package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CubeAgg

/** Cube aggregation: planted all-8-grouping-sets arithmetic, gate
  * cross-check of slices against plain GROUP BYs, and the one-scan
  * Expand plan shape.
  */
class CubeAggSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: every one of the 8 grouping sets aggregates correctly") {
    import spark.implicits._
    val li = Seq(
      ("A", "F", "1996-03-01 00:00:00", 10.0, 100.0, 0.0),
      ("A", "O", "1997-03-01 00:00:00", 20.0, 200.0, 0.0),
      ("R", "F", "1996-06-01 00:00:00", 30.0, 300.0, 0.0))
      .toDF("l_returnflag", "l_linestatus", "ship", "l_quantity",
        "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val out = CubeAgg.cubeAggQ(li).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.size == 18) // 8 sets over 3 distinct rows
    assert(out(("ALL", "ALL", "ALL")) == ((3L, 600L, 60000L)))
    assert(out(("A", "ALL", "ALL")) == ((2L, 300L, 30000L)))
    assert(out(("ALL", "F", "ALL")) == ((2L, 400L, 40000L)))
    assert(out(("ALL", "ALL", "1996")) == ((2L, 400L, 40000L)))
    assert(out(("A", "F", "ALL")) == ((1L, 100L, 10000L)))
    assert(out(("A", "ALL", "1997")) == ((1L, 200L, 20000L)))
    assert(out(("ALL", "F", "1996")) == ((2L, 400L, 40000L)))
    assert(out(("R", "F", "1996")) == ((1L, 300L, 30000L)))
  }

  test("gate: ALL-slices match independent plain GROUP BYs") {
    val li = Tables.lineitem(spark, sf)
    val out = CubeAgg.cubeAggQ(li).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val byFlag = li.groupBy("l_returnflag")
      .agg(count(lit(1)), sum(expr("CAST(round(l_quantity * 10.0) AS BIGINT)")),
        sum(expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    byFlag.foreach { case (f, t) => assert(out((f, "ALL", "ALL")) == t, f) }
    val total = li.agg(count(lit(1)),
      sum(expr("CAST(round(l_quantity * 10.0) AS BIGINT)")),
      sum(expr("CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(out(("ALL", "ALL", "ALL")) == total)
  }

  test("plan: one scan through Expand — not 8 scans") {
    val plan = CubeAgg.cubeAggQ(Tables.lineitem(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan.take(800))
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan.take(800))
  }
}
