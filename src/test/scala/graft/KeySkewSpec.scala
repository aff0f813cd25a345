package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KeySkew

/** Key-skew report: planted hot-key arithmetic, a Scala recount on the
  * gate fact table, and the TakeOrderedAndProject top-K shape.
  */
class KeySkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("planted: shares, mean multiples and the hot verdict") {
    import spark.implicits._
    // key 1: 6 rows, keys 2..4: 1 row each → total 9, n_keys 4, mean 2
    val df = (Seq.fill(6)(1L) ++ Seq(2L, 3L, 4L)).toDF("k")
    val out = KeySkew.keySkewReport(df, col("k")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))))
    assert(out.head._1 == 1L)
    assert(out.head._2 == ((6L, 666666L, 3000L, true)))  // 6/9 ppm, 3x mean
    assert(out(1)._1 == 2L) // count ties order by key asc
    assert(out(1)._2 == ((1L, 111111L, 500L, false)))
    assert(out.length == 4)
  }

  test("gate fact: top-K recomputes from a plain Scala count") {
    val li = Tables.lineitem(spark, sf)
    val keys = li.select("l_partkey").collect().map(_.getLong(0))
    val counts = keys.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val total = keys.length.toLong
    val mean = math.max(total / counts.size, 1L)
    val expected = counts.toSeq
      .sortBy { case (k, n) => (-n, k) }.take(KeySkew.TopK)
      .map { case (k, n) =>
        (k, n, n * 1000000L / total, n * 1000L / mean,
          n * 1000L / mean >= KeySkew.HotMilli)
      }
    val out = KeySkew.keySkewReportQ(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(out == expected)
  }

  test("plan: top-K is TakeOrderedAndProject; totals ride one nested loop") {
    val plan = KeySkew.keySkewReportQ(Tables.lineitem(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    val nl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(nl <= 1, s"expected <=1 one-row total join, saw $nl")
  }
}
