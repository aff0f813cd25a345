package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AvgFilter

/** Decorrelated Q17: planted threshold arithmetic and a full Scala
  * recount on the gate tables.
  */
class AvgFilterSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: integer cross-multiplied 20%-of-average threshold") {
    import spark.implicits._
    val li = Seq(
      (1L, 1.0, 10.00), (1L, 10.0, 99.00), (1L, 10.0, 99.00), (1L, 10.0, 99.00),
      (2L, 4.0, 50.00), (2L, 4.0, 50.00))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
    val out = AvgFilter.q17AvgFilter(li, part).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    // part 1: sum=31 cnt=4 → qty 1: 5*1*4=20 < 31 ✓ ; qty 10: 200 ✗
    // part 2: sum=8 cnt=2 → qty 4: 40 ✗
    assert(out.toSeq == Seq("B1" -> ((1L, 1L, 1000L))))
  }

  test("gate tables: rollup recomputes from a plain Scala filter") {
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1)),
        math.round(r.getDouble(2) * 100.0)))
    val part = Tables.part(spark, sf).select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pp = li.groupBy(_._1).map { case (k, v) =>
      k -> ((v.map(_._2).sum, v.length.toLong))
    }
    val expected = li.filter { case (pk, q, _) =>
      val (s, c) = pp(pk); 5 * q * c < s
    }.groupBy(t => part(t._1)).map { case (b, v) =>
      b -> ((v.length.toLong, v.map(_._2).sum, v.map(_._3).sum))
    }
    val out = AvgFilter.q17AvgFilter(Tables.lineitem(spark, sf), Tables.part(spark, sf))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == expected)
  }

  test("plan: part dim broadcasts; no correlated re-aggregation window") {
    val plan = AvgFilter.q17AvgFilter(Tables.lineitem(spark, sf),
      Tables.part(spark, sf)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }
}
