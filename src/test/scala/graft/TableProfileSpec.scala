package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableProfile

/** One-scan column profile: planted NULL/distinct/min-max arithmetic,
  * a Scala recount on the gate fact table, and the single-scan plan.
  */
class TableProfileSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: nulls counted, distincts exact, numeric min/max not lexicographic") {
    import spark.implicits._
    val df = Seq(
      (2L, Option("A")), (10L, Option("B")), (100L, None), (2L, Option("B")))
      .toDF("l_orderkey", "l_returnflag")
    val out = TableProfile.tableProfile(df,
      Seq(("l_orderkey", true), ("l_returnflag", false))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    // lexicographic on unpadded strings would give min "10", max "2"
    assert(out("l_orderkey") == ((4L, 0L, 3L, "2", "100")))
    assert(out("l_returnflag") == ((4L, 1L, 2L, "A", "B")))
  }

  test("gate fact: profile recomputes from plain Scala") {
    val li = Tables.lineitem(spark, sf)
    val rows = li.select("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus").collect()
    val colVals: Map[String, Array[String]] = Map(
      "l_orderkey" -> rows.map(_.getLong(0).toString),
      "l_partkey" -> rows.map(_.getLong(1).toString),
      "l_suppkey" -> rows.map(_.getLong(2).toString),
      "l_returnflag" -> rows.map(_.getString(3)),
      "l_linestatus" -> rows.map(_.getString(4)))
    val numeric = Set("l_orderkey", "l_partkey", "l_suppkey")
    val expected = colVals.map { case (c, vs) =>
      val key: String => String =
        if (numeric(c)) s => f"${s.toLong}%020d" else identity
      c -> ((vs.length.toLong, 0L, vs.distinct.length.toLong,
        vs.minBy(key), vs.maxBy(key)))
    }
    val out = TableProfile.tableProfileQ(li).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(out == expected)
  }

  test("plan: one scan feeds the inline stack generator") {
    val plan = TableProfile.tableProfileQ(Tables.lineitem(spark, sf))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
    assert(plan.contains("Generate stack"), plan.take(800))
  }
}
