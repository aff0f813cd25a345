package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EmbeddingRegression, SignalOps}

/** The cross-modal ridge twin's contract (test_train.py:66-113):
  *  1. the engine's closed-form (adjugate) solve agrees with an
  *     INDEPENDENT driver-side Gaussian-elimination ridge fit on the
  *     same exact integer sufficient statistics — the sklearn-parity
  *     pin without sklearn;
  *  2. the retrieval readout cross-derives from the per-trial verdicts
  *     (support/prediction/hit conservation);
  *  3. totality on an empty events frame (regression empty, eval = K
  *     all-zero rows — the left-join spine).
  */
class EmbeddingRegressionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def feats(): Array[(Long, Array[Long])] = {
    val events = Tables.events(spark, sf)
    EmbeddingRegression
      .trialFeatures(SignalOps.epochFeatures(SignalOps.silver(events)))
      .collect()
      .map(r => (r.getLong(0), Array(r.getLong(1), r.getLong(2), r.getLong(3))))
  }

  /** Plain Gaussian elimination with partial pivoting — deliberately a
    * DIFFERENT algorithm than the operator's adjugate formula. */
  private def solve(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] = {
    val n = a.length
    val m = b.head.length
    val aug = Array.tabulate(n)(i => a(i).clone() ++ b(i))
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(i => math.abs(aug(i)(col)))
      val t = aug(col); aug(col) = aug(piv); aug(piv) = t
      require(math.abs(aug(col)(col)) > 0.0, "singular system in spec solver")
      for (row <- 0 until n if row != col) {
        val f = aug(row)(col) / aug(col)(col)
        for (k <- col until n + m) aug(row)(k) -= f * aug(col)(k)
      }
    }
    Array.tabulate(n)(i => Array.tabulate(m)(e => aug(i)(n + e) / aug(i)(i)))
  }

  test("closed-form solve matches an independent Gaussian-elimination ridge fit") {
    val all = feats()
    val train = all.filter(_._1 % EmbeddingRegression.TestMod != 0)
    val test = all.filter(_._1 % EmbeddingRegression.TestMod == 0)
    assert(train.length > 10 && test.nonEmpty, "fixture too small to be meaningful")
    // exact integer sufficient statistics, like the engine's
    val aInt = Array.ofDim[Long](3, 3)
    val bInt = Array.ofDim[Long](3, 4)
    train.foreach { case (id, x) =>
      val g = EmbeddingRegression.Gallery((id % EmbeddingRegression.K).toInt)
      for (i <- 0 until 3; j <- 0 until 3) aInt(i)(j) += x(i) * x(j)
      for (i <- 0 until 3; e <- 0 until 4) bInt(i)(e) += x(i) * g(e)
    }
    val a = Array.tabulate(3, 3)((i, j) =>
      aInt(i)(j).toDouble + (if (i == j) EmbeddingRegression.AlphaQ.toDouble else 0.0))
    val b = Array.tabulate(3, 4)((i, e) => bInt(i)(e).toDouble)
    val w = solve(a, b)
    val want: Map[Long, Array[Double]] = test.map { case (id, x) =>
      id -> Array.tabulate(4)(e => (0 until 3).map(i => x(i).toDouble * w(i)(e)).sum)
    }.toMap
    val got = EmbeddingRegression
      .embeddingRegressionQ(Tables.events(spark, sf)).collect()
      .map(r => r.getLong(0) -> Array(r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(got.keySet == want.keySet, "test-split trial sets differ")
    got.foreach { case (id, p) =>
      val q = want(id)
      val scale = q.map(math.abs).max.max(1.0)
      (0 until 4).foreach { e =>
        assert(math.abs(p(e) - q(e)) / scale < 1e-6,
          s"trial $id dim $e: engine ${p(e)} vs independent ${q(e)}")
      }
    }
  }

  test("retrieval_eval cross-derives from the per-trial regression verdicts") {
    val events = Tables.events(spark, sf)
    val rows = EmbeddingRegression.embeddingRegressionQ(events).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(7))) // (gid, pred_gid, cos_ppm)
    val eval = EmbeddingRegression.retrievalEvalQ(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(eval.keySet == (0L until EmbeddingRegression.K.toLong).toSet)
    val nTest = rows.length.toLong
    assert(eval.values.map(_._1).sum == nTest, "sum n_true != n_test")
    assert(eval.values.map(_._2).sum == nTest, "sum n_pred != n_test")
    (0L until EmbeddingRegression.K.toLong).foreach { k =>
      val (nTrue, nPred, nCorrect, accPpm, sumCos) = eval(k)
      assert(nTrue == rows.count(_._1 == k))
      assert(nPred == rows.count(_._2 == k))
      assert(nCorrect == rows.count(t => t._1 == k && t._2 == k))
      assert(accPpm == 1000000L * nCorrect / math.max(nTrue, 1L))
      assert(sumCos == rows.filter(_._1 == k).map(_._3).sum)
    }
  }

  test("total on an empty events frame: regression empty, eval = K zero rows") {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType))))
    assert(EmbeddingRegression.embeddingRegressionQ(empty).count() == 0)
    val eval = EmbeddingRegression.retrievalEvalQ(empty).collect()
    assert(eval.length == EmbeddingRegression.K)
    eval.foreach { r =>
      (1 to 5).foreach(i => assert(r.getLong(i) == 0L, s"non-zero field $i on empty input"))
    }
  }
}
