package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopSupplier

/** Q15 top supplier: planted max tie, a Scala recount of the window
  * revenue + max on the gate table, and the decorrelated plan shape.
  */
class TopSupplierSpec extends AnyFunSuite {
  import SparkTestSession._

  private def li(rows: Seq[(Long, String, Double, Double)]) = {
    import spark.implicits._
    rows.toDF("l_suppkey", "ship", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
  }

  private def supp(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("s_suppkey", "s_name")
  }

  test("planted: both suppliers tied at max are emitted; window excluded rows don't count") {
    val l = li(Seq(
      (1L, "1997-02-01 00:00:00", 100.0, 0.0),   // in window: 10000 cents
      (2L, "1997-03-15 00:00:00", 50.0, 0.0),    // in window: 5000
      (2L, "1997-03-20 00:00:00", 50.0, 0.0),    // in window: 5000 → ties s1
      (2L, "1996-12-31 00:00:00", 999.0, 0.0),   // before window
      (3L, "1997-04-01 00:00:00", 999.0, 0.0)))  // at end bound (excluded)
    val s = supp(Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    val out = TopSupplier.topSupplierQ(l, s).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "alpha", 10000L), (2L, "beta", 10000L)))
  }

  test("gate: recount window revenue + max from plain Scala") {
    val rows = Tables.lineitem(spark, sf)
      .select(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))"),
        col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .filter(r => r.getLong(0) >= TopSupplier.WindowStartUs &&
        r.getLong(0) < TopSupplier.WindowEndUs)
    val rev = rows.groupBy(_.getLong(1)).map { case (k, rs) =>
      k -> rs.map(r => math.round(r.getDouble(2) * (1.0 - r.getDouble(3)) * 100.0)).sum
    }
    val mx = rev.values.max
    val expected = rev.filter(_._2 == mx).keys.toSeq.sorted
    val out = TopSupplier
      .topSupplierQ(Tables.lineitem(spark, sf), Tables.supplier(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.map(_._1).toSeq == expected)
    assert(out.forall(_._2 == mx))
  }

  test("plan: decorrelated — no window, one 1-row max nested loop, broadcast dim join") {
    val plan = TopSupplier
      .topSupplierQ(Tables.lineitem(spark, sf), Tables.supplier(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan.take(800))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }
}
