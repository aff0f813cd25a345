package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ewma

/** Truncated-kernel EWMA semantics on planted daily series, checked
  * EXACTLY against a transparent in-test integer reference running the
  * same per-term arithmetic (the MarkovStationary pattern). */
class EwmaSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val UsPerDay = 86400000000L

  /** events: one row per (day, i) occurrence for a single type. */
  private def eventsFor(countsByDay: Seq[Long], tpe: String = "a") = {
    val rows = countsByDay.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map(i => (d.toLong * 100 + i, 1L, d.toLong * UsPerDay, tpe))
    }
    rows.toDF("event_id", "user_id", "t_us", "event_type")
      .withColumn("ts", expr("timestamp_micros(t_us)"))
  }

  /** The operator's own integer kernel on a dense series. */
  private def reference(xs: Seq[Long]): Seq[Long] =
    xs.indices.map { d =>
      (0 until Ewma.Kernel).map { k =>
        if (d - k < 0) 0L else xs(d - k) * 1000000L / (1L << (k + 1))
      }.sum
    }

  private def got(countsByDay: Seq[Long]): Seq[Long] =
    Ewma.ewmaDaily(eventsFor(countsByDay)).orderBy("day")
      .select("ewma_ppm").collect().map(_.getLong(0)).toSeq

  test("spike decays geometrically; beyond the kernel it contributes nothing") {
    // day 0 spike, quiet middle, day 18 closes the span: days 1..15 read
    // the halving tail of the spike, days 16..17 read EXACTLY 0 (the
    // stated K=16 truncation), day 18 reads only its own half-weight
    val xs = Seq(1L) ++ Seq.fill(17)(0L) ++ Seq(1L)
    val g = got(xs)
    assert(g == reference(xs), s"diverges from reference: $g")
    assert(g(1) == 250000L && g(2) == 125000L, s"halving tail: $g")
    assert(g(16) == 0L && g(17) == 0L, "kernel truncation must zero the far tail")
    assert(g(18) == 500000L, "own-day weight is exactly half")
  }

  test("constant series warms up to the full truncated kernel mass, holes decay") {
    val const = Seq.fill(20)(3L)
    val g = got(const)
    assert(g == reference(const))
    // warmed-up value: constant for every day past the kernel; deficit
    // vs 3·10⁶ = dropped tail mass (3·10⁶·2^-16 ≈ 46) + per-term
    // truncation (≤ 16) — both stated contract corners
    val warm = g.drop(Ewma.Kernel - 1).toSet
    assert(warm.size == 1, s"warmed-up EWMA must be constant: $warm")
    val deficit = 3000000L - warm.head
    assert(deficit >= 0 && deficit <= 3000000L / (1L << Ewma.Kernel) + Ewma.Kernel,
      s"mass deficit outside the stated truncation budget: $warm")
    // a hole is a REAL zero: the smoother decays across it
    val holed = Seq(4L, 4L, 4L, 0L, 4L)
    val h = got(holed)
    assert(h == reference(holed))
    assert(h(3) < h(2) && h(4) > h(3), s"hole must decay then recover: $h")
  }
}
