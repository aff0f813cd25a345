package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChannelCorr

/** Cross-channel correlation: planted perfect/anti/flatline cases, exact
  * sufficient-statistic recount on the gate corpus, and the alignment
  * (common-prefix) contract.
  */
class ChannelCorrSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  private def df(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, ch, v), i) =>
      (i.toLong, new Timestamp(1700000000000L + i * 1000L), u, ch, v, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("planted: r=1 on identical series, r=-1 on negated, NULL on flatline, prefix alignment") {
    val rows = Seq[(Long, String, Double)](
      // u1: click == view scaled → r = 1; purchase = -view → r = -1
      (1L, "view", 1.0), (1L, "click", 2.0), (1L, "purchase", -1.0),
      (1L, "view", 2.0), (1L, "click", 4.0), (1L, "purchase", -2.0),
      (1L, "view", 4.0), (1L, "click", 8.0), (1L, "purchase", -4.0),
      // u2: signup flat → NULL r against view
      (2L, "signup", 5.0), (2L, "view", 1.0),
      (2L, "signup", 5.0), (2L, "view", 3.0),
      // u2 view has a third sample with no signup partner — prefix drops it
      (2L, "view", 9.0))
    val out = ChannelCorr.channelCorrelationQ(df(rows)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(out((1L, "click", "view")) == ((3L, Some(1.0))), "identical-up-to-scale pair")
    assert(out((1L, "purchase", "view")) == ((3L, Some(-1.0))), "negated pair")
    assert(out((1L, "click", "purchase")) == ((3L, Some(-1.0))))
    assert(out((2L, "signup", "view")) == ((2L, None)), "flatline must yield NULL r, n=2 prefix")
  }

  test("gate corpus: exact integer sufficient statistics reproduce every r") {
    val b = graft.operators.SignalOps.bronzeIngest(events)
      .select(col("trial_id"), col("channel"), col("sample_idx"), col("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    val byTC = b.groupBy(e => (e._1, e._2))
      .view.mapValues(_.sortBy(_._3).map(_._4)).toMap
    val expected = byTC.keySet.groupBy(_._1).flatMap { case (t, chs) =>
      val sorted = chs.map(_._2).toSeq.sorted
      for {
        i <- sorted.indices; j <- (i + 1) until sorted.size
        x0 = byTC((t, sorted(i))); y0 = byTC((t, sorted(j)))
        n = math.min(x0.length, y0.length) if n > 0
      } yield {
        val x = x0.take(n); val y = y0.take(n)
        val (sx, sy) = (x.sum, y.sum)
        val (sxx, syy) = (x.map(v => v * v).sum, y.map(v => v * v).sum)
        val sxy = x.zip(y).map { case (a, c) => a * c }.sum
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        val r =
          if (vx == 0L || vy == 0L) None
          else Some((n * sxy - sx * sy).toDouble / math.sqrt(vx.toDouble * vy.toDouble))
        (t, sorted(i), sorted(j)) -> ((n.toLong, r))
      }
    }
    val out = ChannelCorr.channelCorrelationQ(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(out.keySet == expected.keySet)
    expected.foreach { case (k, (n, rOpt)) =>
      val (gn, gr) = out(k)
      assert(gn == n, s"$k n $gn != $n")
      (rOpt, gr) match {
        case (None, None) =>
        case (Some(w), Some(g)) =>
          val rounded = math.round(w * 10000.0) / 10000.0
          assert(math.abs(g - rounded) < 1e-9, s"$k r $g != $rounded")
        case _ => fail(s"$k null-mismatch: $gr vs $rOpt")
      }
    }
    assert(out.nonEmpty && out.values.exists(_._2.isDefined), "no defined r at gate scale")
  }
}
