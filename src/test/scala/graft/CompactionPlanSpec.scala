package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CompactionPlan

/** The packing algebra's invariants on the gate corpus (the planted
  * arithmetic lives in the shared tokenBudgetPack text): groups are
  * CONTIGUOUS and monotone in shard order, every group's mass stays
  * under target + its last shard (no mid-shard splits by design), and
  * masses reconcile exactly with the manifest. */
class CompactionPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gate corpus: monotone contiguous groups, exact mass reconciliation") {
    val docs = Tables.documents(spark, sf)
    val plan = CompactionPlan.compactionPlan(docs).collect()
    assert(plan.nonEmpty)
    // shard-ordered group ids never decrease and never skip
    val gs = plan.map(_.getLong(5))
    assert(gs.zip(gs.tail).forall { case (a, b) => b == a || b == a + 1 || b > a },
      "groups not monotone")
    assert(gs.head == 0L, "first group must be 0")
    // cum_before is the exact running sum of prior masses
    var run = 0L
    plan.foreach { r =>
      assert(r.getLong(3) == run, s"cum_before drift at shard ${r.get(0)}")
      run += r.getLong(2)
    }
    // every group's START obeys the div rule: group == cum_before div target
    plan.foreach { r =>
      assert(r.getLong(5) == r.getLong(3) / r.getLong(4), "group ≠ cum div target")
    }
    // target is data-derived: total div 8 (gate corpus is non-empty)
    val total = plan.map(_.getLong(2)).sum
    assert(plan.head.getLong(4) == math.max(total / CompactionPlan.Groups, 1L))
  }

  test("empty corpus: total, zero rows") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    assert(CompactionPlan.compactionPlan(empty).count() == 0)
  }
}
