package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusDiff, ThetaDiff}

/** The theta-sketch contract, CardinalitySpec-style: measured accuracy
  * against the exact distinct-content diff at gate scale (3σ binomial
  * bound per source AND globally), and the merge/set-algebra properties
  * that make the sampled sets SKETCHES rather than just samples. */
class ThetaDiffSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  private val fpExpr =
    "md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))"

  private def exactFps(snap: DataFrame): DataFrame =
    snap.select(col("source"), expr(fpExpr).as("fp")).distinct()

  test("estimates land within 3σ of the exact per-source diff (measured)") {
    val p = 1.0 / ThetaDiff.Scale
    val o = exactFps(CorpusDiff.oldSnapshot(docs)).withColumn("in_old", lit(1))
    val n = exactFps(CorpusDiff.newSnapshot(docs)).withColumn("in_new", lit(1))
    val exact = o.join(n, Seq("source", "fp"), "full_outer")
      .groupBy("source")
      .agg(sum(coalesce(col("in_old"), lit(0))).as("old_d"),
        sum(coalesce(col("in_new"), lit(0))).as("new_d"),
        sum(when(col("in_old").isNull, 1).otherwise(0)).as("added"),
        sum(when(col("in_new").isNull, 1).otherwise(0)).as("removed"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val est = ThetaDiff.thetaDiffQ(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(est.nonEmpty, "no source produced a sampled fingerprint — vacuous")
    // binomial over the distinct universe: sd(count/p) = sqrt(n(1-p)/p)
    def sigma(x: Long): Double = math.sqrt(math.max(x, 1).toDouble * (1 - p) / p)
    est.foreach { case (src, (eo, en, eadd, erem)) =>
      val (xo, xn, xadd, xrem) = exact(src)
      def within(e: Long, x: Long, what: String): Unit =
        assert(math.abs(e - x) <= 3 * sigma(x) + ThetaDiff.Scale,
          f"$src/$what: est $e vs exact $x exceeds 3σ=${3 * sigma(x)}%.0f")
      within(eo, xo, "old"); within(en, xn, "new")
      within(eadd, xadd, "added"); within(erem, xrem, "removed")
    }
    // and globally (where the bound is tight enough to mean something)
    def tot(m: Map[String, (Long, Long, Long, Long)], i: Int): Long =
      m.values.map(t => i match { case 0 => t._1; case 1 => t._2; case 2 => t._3; case _ => t._4 }).sum
    (0 to 3).foreach { i =>
      val (e, x) = (tot(est, i), tot(exact, i))
      assert(math.abs(e - x) <= 3 * sigma(x) + ThetaDiff.Scale,
        s"global component $i: est $e vs exact $x")
    }
  }

  test("fixed-θ sketches MERGE by plain union: sample(A ∪ B) = sample(A) ∪ sample(B)") {
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    def s(df: DataFrame) = ThetaDiff.thetaFps(df)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(s(half1.unionAll(half2)) == (s(half1) ++ s(half2)))
    assert(s(docs).nonEmpty)
  }

  test("set algebra is exact on the sampled space: sample(A)∖sample(B) = sample(A∖B)") {
    // the property HLL register subtraction lacks
    val a = ThetaDiff.thetaFps(CorpusDiff.oldSnapshot(docs))
    val b = ThetaDiff.thetaFps(CorpusDiff.newSnapshot(docs))
    val viaSketch = a.join(b, Seq("source", "fp"), "left_anti")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val exactDiff = exactFps(CorpusDiff.oldSnapshot(docs))
      .join(exactFps(CorpusDiff.newSnapshot(docs)), Seq("source", "fp"), "left_anti")
    val sampledExactDiff = exactDiff
      .filter(expr(s"substring(fp, 1, 1) < '${ThetaDiff.ThetaHexBound}'"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaSketch == sampledExactDiff)
    assert(viaSketch.nonEmpty, "no removed fingerprint sampled — vacuous")
  }
}
