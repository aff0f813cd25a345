package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ColumnOutliers, CorpusDiff, EquidepthHist, ProfileDrift}

/** Profiling trio: equi-depth boundaries (order-statistic + tie-closure
  * identities), Tukey-fence outlier counts, and snapshot profile drift —
  * each against an independent Scala recount.
  */
class ProfilingOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("gate corpus: equi-depth boundaries and cumulative counts") {
    val cents = Tables.lineitem(spark, sf)
      .selectExpr("CAST(round(l_extendedprice * 100.0) AS BIGINT) AS c")
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val b = EquidepthHist.NumBuckets
    val expected = (1 to b).map { k =>
      val idx = ((n - 1) * k / b).toInt // 0-based
      val v = cents(idx)
      (k, v, cents.count(_ <= v).toLong, n)
    }
    val got = EquidepthHist.equidepthHistQ(Tables.lineitem(spark, sf)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // depth sanity: each bucket's cumulative count is within ties of k*n/b
    got.foreach { case (k, _, cum, _) =>
      assert(cum >= (n - 1) * k / b + 1, s"bucket $k cum $cum below its rank")
    }
  }

  test("equi-depth range form is row-identical to the window form at several partition counts") {
    // the scale rewrite (offset algebra over the value domain) must be a
    // pure plan change: same rows whatever the range-partition width —
    // the tokenBudgetPackRange shared-oracle argument
    val li = Tables.lineitem(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("bucket")
      .collect().map(_.toString).toSeq
    val window = rows(EquidepthHist.equidepthHist(li))
    Seq(1, 3, 8, 32).foreach { p =>
      assert(rows(EquidepthHist.equidepthHistRange(li, numParts = p)) == window,
        s"range form diverged at numParts=$p")
    }
  }

  test("planted outliers: fences in the doubled domain, boundary-exclusive") {
    import spark.implicits._
    // 11 values 0..10 (q1=2.5->idx ((10)*25)//100=2 -> v=2; q3 idx 7 -> 7;
    // iqr 5; low fence 2*2-15=-11 (2v<-11 none), high 2*7+15=29 (2v>29 ->
    // v>14.5: plant 20, 15; 14 is inside)
    val vals = (0 to 10).map(_.toDouble) ++ Seq(20.0, 15.0, 14.0)
    val df = vals.map(v => (v, 0.0, 0.0, 0.0))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = ColumnOutliers.columnOutliersQ(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // 14 values: q1 idx ((13)*25)//100=3 -> sorted(0..10,14,15,20)(3)=3 (300c);
    // q3 idx ((13)*75)//100=9 -> 9 (900c); iqr 600c; hi: 2v > 1800+1800=3600
    // -> v > 1800c: 2000c only. lo: 2v < 600-1800=-1200: none
    assert(out("l_quantity") == ((14L, 300L, 900L, 600L, 0L, 1L)),
      s"quantity ${out("l_quantity")}")
    assert(out("l_discount") == ((14L, 0L, 0L, 0L, 0L, 0L)), "constant column")
  }

  test("gate corpus: column outlier recount") {
    val rows = Tables.lineitem(spark, sf)
      .selectExpr(ColumnOutliers.Cols.map(c =>
        s"CAST(round($c * 100.0) AS BIGINT) AS $c"): _*)
      .collect()
    val expected = ColumnOutliers.Cols.zipWithIndex.map { case (c, i) =>
      val vs = rows.map(_.getLong(i)).sorted
      val n = vs.length.toLong
      val q1 = vs((((n - 1) * 25) / 100).toInt)
      val q3 = vs((((n - 1) * 75) / 100).toInt)
      val iqr = q3 - q1
      (c, n, q1, q3, iqr,
        vs.count(v => 2 * v < 2 * q1 - 3 * iqr).toLong,
        vs.count(v => 2 * v > 2 * q3 + 3 * iqr).toLong)
    }.sortBy(_._1)
    val got = ColumnOutliers.columnOutliersQ(Tables.lineitem(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
  }

  test("gate corpus: profile drift recount from the snapshot frames") {
    def prof(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("source", "length(coalesce(text, '')) AS lc", "lang")
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getString(2)))
      .groupBy(_._1).map { case (s, v) =>
        s -> ((v.size.toLong, v.map(_._2).sum, v.map(_._3).filter(_ != null).distinct.size.toLong))
      }
    val docs = Tables.documents(spark, sf)
    val o = prof(CorpusDiff.oldSnapshot(docs))
    val n = prof(CorpusDiff.newSnapshot(docs))
    val expected = (o.keySet ++ n.keySet).toSeq.sorted.map { s =>
      val (od, oc, ol) = o.getOrElse(s, (0L, 0L, 0L))
      val (nd, nc, nl) = n.getOrElse(s, (0L, 0L, 0L))
      (s, od, nd, nd - od, oc, nc, nc - oc, ol, nl)
    }
    val got = ProfileDrift.profileDriftQ(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toSeq
    assert(got == expected)
  }
}
