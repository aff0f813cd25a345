package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{BandPlan, Dedup, PrefixJoin}

/** Scratch measurement: does the CALIBRATED band beat the HotDfFloor
  * constant where it matters? The gate corpus is the hybrid's honest
  * adversarial shape (31-term vocabulary ⇒ nearly every bigram df
  * exceeds 1000, so the default band runs the full hot path — the 22 s
  * bench tail). [[BandPlan]]'s cost model should either (a) pick a band
  * ABOVE the gate's max df, collapsing the hybrid to the plain inverted
  * index (the all-cold fast path), or (b) pick a cut that beats both.
  * This main reports the recommendation, the calibrator's own cost, and
  * min-of-2 walls for plain / hybrid@default / hybrid@recommended —
  * output feeds PERF.md and the registration decision, not a gate. */
object StressBand {
  def main(args: Array[String]): Unit = {
    // sf0.01 base like StressPrefix: the 10× stress corpora are built for
    // it — at sf0.1×10 hotonly's one hot key alone is C(50000,2) ≈ 1.25e9
    // candidate pairs on a single reducer, a measurement of the harness,
    // not the operator. The REGISTERED query's corpus (gate sf0.1) is
    // covered by the `gate` mode: `runMain graft.StressBand <sfDir> <work>
    // gate` times only the gate row.
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_stress10x"
    val gateOnly = args.length > 2 && args(2) == "gate"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gate = Tables.documents(spark, baseDir)
    def materialize(df: DataFrame, name: String): DataFrame = {
      val path = s"$workDir/$name"
      if (!new java.io.File(path, "_SUCCESS").exists())
        df.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val corpora: Seq[(String, DataFrame)] =
      if (gateOnly) Seq(("gate", gate))
      else Seq(
        ("gate", gate),
        ("uniform10x", materialize(StressCorpora.uniform10x(gate), "uniform10x")),
        ("skewed10x", materialize(StressCorpora.skewed10x(gate), "skewed10x")),
        ("hotonly10x", materialize(StressCorpora.hotonly10x(gate), "hotonly10x")))

    def time(f: => Long): (Double, Long) = {
      var n = 0L
      val t = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); n = f; (System.nanoTime() - t0) / 1e9
      }.min
      (t, n)
    }

    corpora.foreach { case (name, docs) =>
      val t0 = System.nanoTime()
      val band = BandPlan.recommendedBand(docs)
      val calS = (System.nanoTime() - t0) / 1e9
      val (tPlain, nPlain) = time(Dedup.ngramJaccardPairs(docs).count())
      val (tDef, nDef) = time(PrefixJoin.hybridJaccardPairs(docs).count())
      val (tRec, nRec) = time(PrefixJoin.hybridJaccardPairs(docs, dfBand = band).count())
      // the registered round-13 path: band self-calibrated from the
      // hybrid's own index (histogram rollup + 1-row read, inline)
      val (tAuto, nAuto) = time(PrefixJoin.hybridJaccardAuto(docs).count())
      require(nPlain == nDef && nDef == nRec && nRec == nAuto,
        s"$name: pair counts diverge ($nPlain/$nDef/$nRec/$nAuto)")
      println(f"BAND corpus=$name band=$band cal_s=$calS%.2f " +
        f"plain_s=$tPlain%.2f hybrid_default_s=$tDef%.2f hybrid_rec_s=$tRec%.2f " +
        f"hybrid_auto_s=$tAuto%.2f pairs=$nPlain")
    }
    spark.stop()
  }
}
