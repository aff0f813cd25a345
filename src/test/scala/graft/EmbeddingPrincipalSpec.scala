package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EmbeddingPrincipal

/** embedding_principal — integer power iteration vs a driver-side double
  * replay, planted-axis recovery, and Rayleigh improvement over the
  * start direction. */
class EmbeddingPrincipalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  private def collectQuantized: Array[Array[Double]] = emb
    .select(expr(
      "transform(embedding, e -> CAST(round(CAST(e AS DOUBLE) * 1000.0) AS BIGINT))"))
    .collect().map(_.getSeq[Long](0).map(_.toDouble).toArray)

  test("gate corpus: integer iteration tracks the double power iteration to cos >= 0.999") {
    val xs = collectQuantized
    assert(xs.nonEmpty)
    val d = xs.head.length
    var v = Array.tabulate(d)(i => if (i == 0) 1000.0 else 0.0)
    (1 to EmbeddingPrincipal.Rounds).foreach { _ =>
      val dots = xs.map(x => x.zip(v).map { case (a, b) => a * b }.sum)
      val u = Array.tabulate(d)(i => xs.zip(dots).map { case (x, dt) => x(i) * dt }.sum)
      val m = u.map(math.abs).max
      v = if (m == 0) v else u.map(_ / m * 1000.0)
    }
    val got = EmbeddingPrincipal.embeddingPrincipalQ(emb).collect()
      .map(_.getLong(1).toDouble)
    assert(got.length == d)
    val c = cosine(got, v)
    assert(c >= 0.999, f"integer direction drifted off the double replay: cos=$c%.5f")
  }

  test("planted dominant axis is recovered") {
    // 40 vectors = ±2 on axis 7 plus small deterministic off-axis noise.
    // The noise must NOT share the axis sign: sign-correlated noise makes
    // the e0 start exactly orthogonal to e7 in the induced inner product
    // (the u_7 seed sum telescopes to zero) and power iteration can never
    // leave the orthogonal complement — measured, not hypothetical.
    // (noise pattern simulated against the exact integer recurrence
    // before committing — the first two patterns tried, (i·7+j)%5 signed
    // AND unsigned, both telescope u_7 to exactly zero over 40 vectors)
    val d = 16
    val fix = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      val a = Array.tabulate(d)(j =>
        if (j == 7) 2.0f * sign else ((i * 31 + j * 17) % 11 - 5) * 0.01f)
      (i.toLong, a.toSeq, "x")
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", expr("CAST(embedding AS ARRAY<FLOAT>)"))
    val got = EmbeddingPrincipal.embeddingPrincipalQ(fix).collect()
      .map(_.getLong(1).toDouble)
    val axis = Array.tabulate(d)(j => if (j == 7) 1.0 else 0.0)
    val c = math.abs(cosine(got, axis))
    assert(c >= 0.99, f"planted axis not recovered: |cos|=$c%.4f loadings=${got.mkString(",")}")
  }

  test("gate corpus: Rayleigh quotient of the result beats the start direction") {
    val xs = collectQuantized
    val d = xs.head.length
    def rayleigh(v: Array[Double]): Double = {
      val n2 = v.map(x => x * x).sum
      if (n2 == 0) 0.0
      else xs.map(x => math.pow(x.zip(v).map { case (a, b) => a * b }.sum, 2)).sum / n2
    }
    val got = EmbeddingPrincipal.embeddingPrincipalQ(emb).collect()
      .map(_.getLong(1).toDouble)
    val start = Array.tabulate(d)(i => if (i == 0) 1.0 else 0.0)
    assert(rayleigh(got) >= rayleigh(start),
      "iteration failed to improve the mass captured by the start axis")
  }
}
