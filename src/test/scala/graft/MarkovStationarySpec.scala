package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MarkovStationary

/** Power-iteration semantics on a planted chain whose stationary
  * distribution is known analytically (2/3, 1/3), checked EXACTLY
  * against a transparent in-test integer reference running the same
  * ppm arithmetic, plus the terminal-state restriction. */
class MarkovStationarySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def pathEvents(path: Seq[String]) =
    path.zipWithIndex.map { case (t, i) => (1L, i.toLong + 1, i.toLong * 1000000L, t) }
      .toDF("user_id", "event_id", "t_us", "event_type")
      .withColumn("ts", expr("timestamp_micros(t_us)"))

  /** The operator's own integer algorithm on a tiny matrix: raw mass
    * w_j = Σ π_i·p_ij, renormalize w_j·10⁶ div Σw (Long / truncates
    * exactly like div on non-negatives). */
  private def reference(p: Seq[(String, String, Long)], k: Int): Map[String, Long] = {
    val states = p.map(_._1).distinct.sorted
    var pi: Map[String, Long] = states.map(_ -> 1000000L / states.size).toMap
    for (_ <- 1 to k) {
      val w = p.groupBy(_._2).view.mapValues(
        _.map { case (u, _, pp) => pi(u) * pp }.sum).toMap
      val tot = w.values.sum
      pi = w.map { case (s, v) => s -> v * 1000000L / tot }
    }
    pi
  }

  test("planted 2-state chain: K=8 iterate matches the integer reference and the analytic limit") {
    // path a a b a a b a: transitions a→a 2, a→b 2, b→a 2 →
    // p_aa = p_ab = 500000, p_ba = 10⁶; analytic stationary (2/3, 1/3)
    val got = MarkovStationary.transitionStationary(
      pathEvents(Seq("a", "a", "b", "a", "a", "b", "a"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = reference(Seq(
      ("a", "a", 500000L), ("a", "b", 500000L), ("b", "a", 1000000L)), 8)
    assert(got == want, s"iterate diverges from reference: $got vs $want")
    assert(math.abs(got("a") - 666666L) <= 5000 &&
      math.abs(got("b") - 333333L) <= 5000, s"far from analytic limit: $got")
    assert(math.abs(got.values.sum - 1000000L) <= 2, s"mass leaked: $got")
  }

  test("l1_delta_ppm is Σ|π_K − π_{K−1}| from the reference, constant across rows") {
    // round-14 convergence diagnostic: the emitted L1 must equal the
    // reference's distance between the last two iterates exactly (same
    // integer arithmetic), ride every row unchanged, and be tiny on this
    // settled chain — the "has it converged" read needs no K trust
    val rows = MarkovStationary.transitionStationary(
      pathEvents(Seq("a", "a", "b", "a", "a", "b", "a"))).collect()
    val l1s = rows.map(_.getLong(2)).toSet
    assert(l1s.size == 1, s"l1_delta_ppm differs across rows: $l1s")
    val p = Seq(("a", "a", 500000L), ("a", "b", 500000L), ("b", "a", 1000000L))
    val pi8 = reference(p, 8)
    val pi7 = reference(p, 7)
    val want = (pi8.keySet ++ pi7.keySet).toSeq
      .map(s => math.abs(pi8.getOrElse(s, 0L) - pi7.getOrElse(s, 0L))).sum
    assert(l1s.head == want, s"L1 ${l1s.head} != reference $want")
    // this chain's second eigenvalue is −1/2, so the K-step delta decays
    // as 0.5^K·10⁶ ≈ 3906 ppm at K=8 — the diagnostic SHOWS the geometric
    // approach instead of hiding it (that's its purpose); pin the decay
    // band rather than a false "fully settled" claim
    assert(l1s.head >= 2000L && l1s.head <= 5000L,
      s"K=8 delta should sit at ~0.5^8 of the mass: ${l1s.head}")
  }

  test("terminal-only state is dropped and its row mass renormalized") {
    // …the same chain plus a final 'z' that never emits: the a→z edge
    // is removed, a's row renormalizes over {a, b} → identical π, no z
    val got = MarkovStationary.transitionStationary(
      pathEvents(Seq("a", "a", "b", "a", "a", "b", "a", "z"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("z"), s"terminal state leaked into the chain: $got")
    val want = reference(Seq(
      ("a", "a", 500000L), ("a", "b", 500000L), ("b", "a", 1000000L)), 8)
    assert(got == want, s"restriction changed the kept chain: $got vs $want")
  }
}
