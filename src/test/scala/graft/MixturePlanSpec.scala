package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MixturePlan

/** Mixture compilation invariants: integer budget algebra, the maximal-
  * prefix partial pass, genuine up- AND down-sampling on the gate corpus,
  * and plan-shape sanity (the only joins are broadcasts of strata-sized
  * frames).
  */
class MixturePlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val rows = MixturePlan.mixturePlan(docs).collect().map { r =>
    (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(8), r.getLong(9))
  }

  test("per-stratum algebra: epochs/partial reproduce target div/mod inventory") {
    val byLang = rows.groupBy(_._2)
    val total = byLang.values.flatten.map(_._3).sum
    val budget = total * MixturePlan.BudgetNum / MixturePlan.BudgetDen
    byLang.foreach { case (lang, rs) =>
      val inv = rs.map(_._3).sum
      assert(rs.forall(_._5 == inv), s"$lang lang_tokens")
      val target = budget * MixturePlan.TargetPerMille.getOrElse(lang, 0L) / 1000
      assert(rs.forall(_._6 == target), s"$lang target_tokens")
      val epochs = if (inv == 0) 0L else target / inv
      assert(rs.forall(_._7 == epochs), s"$lang epochs_full")
      // partial pass delivers exactly the maximal prefix of target % inv:
      // every admitted doc fits the remainder, the next-in-order doc would not
      val rem = if (inv == 0) 0L else target % inv
      val ordered = rs.sortBy(r => (r._4, r._1))
      var cum = 0L
      ordered.foreach { r =>
        cum += r._3
        assert(r._8 == cum, s"$lang doc ${r._1} cum_tokens")
        assert(r._9 == (cum <= rem), s"$lang doc ${r._1} in_partial")
        assert(r._10 == r._7 + (if (cum <= rem) 1L else 0L), s"$lang doc ${r._1} copies")
      }
    }
  }

  test("the gate corpus exercises both directions: en downsamples, zh upsamples") {
    val byLang = rows.groupBy(_._2)
    assert(byLang("en").forall(r => r._7 == 0 && r._6 < r._5),
      "en target must be under inventory (downsample to a partial pass)")
    assert(byLang("en").exists(_._9) && byLang("en").exists(!_._9),
      "en partial pass must split the stratum")
    assert(byLang("zh").forall(r => r._7 >= 1),
      "zh must repeat at least one full epoch (upsample)")
    // planned token mass per stratum lands within one doc of target
    byLang.foreach { case (lang, rs) =>
      val planned = rs.map(r => r._3 * r._10).sum
      val target = rs.head._6
      val maxDoc = rs.map(_._3).max
      assert(planned <= target && target - planned < maxDoc,
        s"$lang planned $planned vs target $target (maxDoc $maxDoc)")
    }
  }

  test("plan: no shuffle join — the only joins broadcast strata-sized frames") {
    val plan = MixturePlan.mixturePlanQ(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }
}
