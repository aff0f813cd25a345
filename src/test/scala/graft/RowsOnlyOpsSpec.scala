package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class RowsOnlyOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val events = Tables.events(spark, sf)

  test("minhash-LSH finds exactly the exact-jaccard pair set on this corpus") {
    // every true near-dup here sits at j~0.98 where banded-LSH recall is
    // 1 - 1e-11, so the verified candidate set must equal the exact set
    val exact = Dedup.ngramJaccardPairs(docs)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Lsh.minhashLshPairs(docs)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"lsh=${lsh.size} exact=${exact.size} diff=${(exact -- lsh) ++ (lsh -- exact)}")
  }

  test("simhash flags planted near-identical docs within hamming 3") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps running through the field all day"
    val d = Seq(
      (1L, base),
      (2L, base + " tonight"), // one extra word: tiny shingle-set delta
      (3L, "an entirely unrelated document about query engines and shuffle plans with columns")
    ).toDF("doc_id", "text")
    val pairs = Lsh.simhashPairs(d, maxHamming = 8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted pair missed: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("knn LSH: neighbors come from the brute top list with useful recall") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val brute = Similarity.knnCosineBrute(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Lsh.knnCosineLsh(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall@5 too low: $recall")
  }

  test("embedding-dedup LSH: exact precision, measured recall vs exact pairs") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val exact = Similarity.embeddingDedup(emb)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def lshSet(mp: Int) = Lsh.embeddingDedupLsh(emb, multiProbe = mp)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = lshSet(0)
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}") // verified → precision 1
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.25, s"recall too low: $recall")
    // one-sided multi-probe: still precision 1, recall must not regress and
    // must strictly widen candidate coverage on this corpus
    val probed = lshSet(1)
    assert(probed.subsetOf(exact), s"false positives under probing: ${probed -- exact}")
    assert(lsh.subsetOf(probed), "mp=1 candidates must cover the mp=0 pairs")
    val recallProbed = (exact & probed).size.toDouble / exact.size
    assert(recallProbed >= recall, s"multi-probe lowered recall: $recallProbed < $recall")
  }

  test("knn IVF: neighbors verified against brute with useful recall") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, sf01)
    val brute = Similarity.knnCosineBrute(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Ivf.knnCosineIvf(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall@5 too low: $recall")
  }

  test("butterworth design: a0=1, 2N+1 coefficients, stable-looking") {
    val (b, a) = (Iir.bCoef, Iir.aCoef)
    assert(a.length == 2 * Iir.Order + 1 && b.length == a.length)
    assert(math.abs(a(0) - 1.0) < 1e-9)
    assert(b.forall(x => !x.isNaN) && a.forall(x => !x.isNaN))
  }

  test("iir filtfilt: passes 20 Hz, rejects DC and 55 Hz") {
    val fs = Iir.FsHz
    val n = 1024
    def tone(f: Double): Array[Double] =
      Array.tabulate(n)(i => math.sin(2 * math.Pi * f * i / fs))
    def midRms(y: Array[Double]): Double = {
      val mid = y.slice(n / 4, 3 * n / 4)
      math.sqrt(mid.map(v => v * v).sum / mid.length)
    }
    val dcOut = Iir.filtfilt(Iir.bCoef, Iir.aCoef, Array.fill(n)(1.0))
    val inBand = Iir.filtfilt(Iir.bCoef, Iir.aCoef, tone(20.0))
    val outBand = Iir.filtfilt(Iir.bCoef, Iir.aCoef, tone(55.0))
    assert(midRms(dcOut) < 0.05, s"DC leak: ${midRms(dcOut)}")
    assert(midRms(inBand) > 0.6, s"in-band attenuated: ${midRms(inBand)}")
    assert(midRms(outBand) < 0.1, s"out-of-band leak: ${midRms(outBand)}")
  }

  test("iir filtfilt operator emits one row per bronze sample") {
    val bronze = SignalOps.bronzeIngest(events)
    val out = Iir.iirFiltfilt(bronze)
    assert(out.count() == bronze.count())
    assert(out.columns.toSet == Set("trial_id", "channel", "sample_idx", "value", "y_ff"))
  }

  test("ml pipeline predicts a known class for every test row") {
    val preds = MlPipeline.mlTrainPredictQ(events).collect()
    assert(preds.nonEmpty)
    preds.foreach { r =>
      val p = r.getAs[Double]("prediction")
      assert(p >= 0.0 && p < SignalOps.Channels.size, s"prediction out of range: $p")
    }
  }

  test("corpus_filter verdict is consistent with its three component operators") {
    val filt = TextOps.corpusFilter(docs)
      .select("doc_id", "keep_quality", "pred_lang", "canonical_id", "admitted")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getString(2), r.getLong(3), r.getBoolean(4))).toMap
    val quality = TextOps.textQuality(docs).select("doc_id", "keep")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val lang = TextOps.langId(docs).select("doc_id", "pred_lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val canon = TextOps.dedupExact(docs).select("doc_id", "canonical_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(filt.keySet == quality.keySet)
    filt.foreach { case (id, (kq, pl, cid, adm)) =>
      assert(kq == quality(id) && pl == lang(id) && cid == canon(id))
      assert(adm == (kq && pl != "unknown" && cid == id))
    }
    // the filter actually discriminates on this corpus
    val admitted = filt.values.count(_._4)
    assert(admitted > 0 && admitted < filt.size, s"degenerate verdict: $admitted/${filt.size}")
  }

  test("multimodal decode is deterministic, batched, and normalized") {
    val a = Multimodal.multimodalDecode(docs).collect().sortBy(_.getAs[Long]("doc_id"))
    val b = Multimodal.multimodalDecode(docs).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(a.length == docs.count())
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    a.foreach { r =>
      val f = r.getSeq[Double](r.fieldIndex("feature"))
      assert(f.length == 8)
      assert(math.abs(f.sum - 1.0) < 1e-9)
    }
  }

  test("multimodal decode emits a zero-histogram row for an empty payload body") {
    // n_bytes=0 must not vanish from the output (the oracle's unnest(range(0))
    // produces no rows — its LEFT JOIN back to the doc base mirrors this)
    import spark.implicits._
    val d = Seq((1L, "abc"), (2L, "")).toDF("doc_id", "text")
    val rows = Multimodal.multimodalDecode(d).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(rows.length == 2)
    val empty = rows(1)
    assert(empty.getAs[Int]("n_bytes") == 0)
    assert(empty.getAs[Int]("width") == 8 && empty.getAs[Int]("height") == 8)
    assert(empty.getSeq[Double](empty.fieldIndex("feature")).forall(_ == 0.0))
  }

  test("multimodal meta header magic is constant and sizes line up") {
    val rows = Multimodal.multimodalMeta(docs).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("header_hex") == "494D4730") // 'IMG0'
      assert(r.getAs[Int]("byte_len") >= 4)
    }
  }
}
