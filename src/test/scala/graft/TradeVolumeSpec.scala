package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TradeVolume

/** Q7 trade volume: planted directed-pair semantics (same-nation
  * excluded, direction distinguished, year split), a full Scala recount
  * on the gate star, and the one-fact-join plan shape.
  */
class TradeVolumeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: direction, same-nation exclusion, year split") {
    import spark.implicits._
    val nation = Seq((1, "FR"), (2, "DE")).toDF("n_nationkey", "n_name")
    val supplier = Seq((10L, 1), (20L, 2)).toDF("s_suppkey", "s_nationkey")
    val customer = Seq((100L, 1), (200L, 2)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((1000L, 100L), (2000L, 200L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq(
      (1000L, 20L, "1996-05-01 00:00:00", 100.0, 0.0),  // DE→FR 1996: 10000
      (1000L, 20L, "1997-05-01 00:00:00", 50.0, 0.0),   // DE→FR 1997: 5000
      (2000L, 10L, "1996-06-01 00:00:00", 30.0, 0.0),   // FR→DE 1996: 3000
      (2000L, 20L, "1996-07-01 00:00:00", 999.0, 0.0))  // DE→DE: excluded
      .toDF("l_orderkey", "l_suppkey", "ship", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", col("ship").cast("timestamp"))
    val out = TradeVolume.q7TradeVolumeQ(lineitem, orders, customer, supplier, nation)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("DE", "FR", 1996L, 1L, 10000L),
      ("DE", "FR", 1997L, 1L, 5000L),
      ("FR", "DE", 1996L, 1L, 3000L)))
  }

  test("gate: full Scala recount of the pair x year matrix") {
    val li = Tables.lineitem(spark, sf)
    val om = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cn = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sn = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nn = Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val rows = li.selectExpr("l_orderkey", "l_suppkey",
      "CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)",
      "CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)")
      .collect()
    val expected = rows.flatMap { r =>
      val sNk = sn(r.getLong(1)); val cNk = cn(om(r.getLong(0)))
      if (sNk == cNk) None
      else Some(((nn(sNk), nn(cNk), r.getLong(2)), r.getLong(3)))
    }.groupBy(_._1).map { case (k, vs) => (k._1, k._2, k._3, vs.length.toLong,
      vs.map(_._2).sum)
    }.toSeq.sortBy(t => (t._1, t._2, t._3))
    val out = TradeVolume.q7TradeVolumeQ(li, Tables.orders(spark, sf),
      Tables.customer(spark, sf), Tables.supplier(spark, sf), Tables.nation(spark, sf))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == expected)
  }

  test("plan: every dim leg broadcasts; one fact-fact join") {
    val plan = TradeVolume.q7TradeVolumeQ(Tables.lineitem(spark, sf),
      Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf))
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4, plan.take(1000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1000))
  }
}
