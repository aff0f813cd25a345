package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cdc, CharDiversity, Collocations, CorpusDiff, CorpusShuffle, Curation, Dedup, DedupWeights, DocChunk, DupPassages, DupSpans, LangMix, LmScore, MixturePlan, ParagraphClean, ParagraphDedup, ProfileDrift, QualityEnsemble, SampleQuota, ShardManifest, Skipgram, SourceDivergence, SourceOverlap, SpanQuality, SplitLeakage, SplitRepair, SubstringDedup, ThresholdSweep, TokenizeIds, TokenizerFertility, TopicClassify, Vocab, VocabCoverage, VocabDrift, Winnow}

/** Scratch measurement (round-8 verdict #4): the curation suite above
  * gate volume. contamination_check and doc_novelty had only ever run at
  * the sf0.1 gate; this drives them — plus both quality_select forms,
  * both token_budget_pack forms, doc_ngram_repetition, tfidf under both
  * df-join dial settings, and the round-8 paragraph_dedup — at 1× and
  * 10× the sf0.1 corpus, so the PERF.md table shows measured scaling
  * exponents instead of shape arguments.
  *
  * The 10× corpus is [[StressDf2]]'s generator (per-replica cyclic word
  * rotation: replicas are genuine near-dups, vocabulary density grows
  * the way a real corpus's does) — gram/window duplication therefore
  * RISES with volume, which is the adversarial direction for novelty /
  * contamination / paragraph dedup (their duplicate-handling joins get
  * denser, not sparser). Single MIN-of-two-passes timing per config
  * (StressDf2's convention; these are measurement runs, not gates).
  */
object StressCuration {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_stress_curation"
    // optional comma-joined substring filter: run only matching configs
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, baseDir)

    val uniform10x = base
      .withColumn("r", explode(expr("sequence(0, 9)")))
      .withColumn("w", expr("split(lower(trim(text)), '\\\\s+')"))
      .withColumn("rot", expr("concat(slice(w, r + 1, size(w) - r), slice(w, 1, r))"))
      .select((col("doc_id") * lit(10L) + col("r")).as("doc_id"),
        array_join(col("rot"), " ").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

    def materialize(df: DataFrame, name: String): DataFrame = {
      val path = s"$workDir/$name"
      // write with real partitioning: a single-file 10x corpus gives every
      // op a ONE-partition scan side, and an AQE broadcast-collapsed join
      // then serializes the whole pair stage onto one task (observed: the
      // split_leakage candidate agg pinned a single spilling thread for
      // 20+ min). A production corpus is many splits; measure that shape.
      df.repartition(32).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val x10 = materialize(uniform10x, "uniform10x")
    println(s"STATS base=${base.count()} x10=${x10.count()}")

    def time(name: String)(mk: => DataFrame): Unit = {
      if (only.exists(fs => !fs.exists(name.contains))) return
      val passes = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME config=$name sec=${passes.min}%.1f passes=${passes.map(p => f"$p%.1f").mkString("/")}")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    // warmup (JIT/codegen) on the small side
    Curation.contaminationCheck(base).write.format("noop").mode("overwrite").save()

    for ((tag, docs) <- Seq("1x" -> base, "10x" -> x10)) {
      time(s"contamination_$tag") { Curation.contaminationCheck(docs) }
      time(s"novelty_$tag") { Curation.docNovelty(docs) }
      time(s"repetition_$tag") { Curation.ngramRepetition(docs) }
      time(s"quality_select_2pass_$tag") { Curation.qualitySelect(docs) }
      time(s"quality_select_window_$tag") { Curation.qualitySelectWindow(docs) }
      time(s"pack_window_$tag") { Curation.tokenBudgetPack(docs) }
      time(s"pack_range_$tag") { Curation.tokenBudgetPackRange(docs) }
      time(s"tfidf_bcast_$tag") { Curation.tfidfTopTerms(docs) }
      time(s"tfidf_shuffle_$tag") { Curation.tfidfTopTerms(docs, broadcastDf = false) }
      time(s"paragraph_dedup_$tag") { ParagraphDedup.paragraphDedup(docs) }
      // round-8 second half: the two corpus-wide additions (the fixture
      // ops line_filter/url_domain_filter have no corpus-scale path)
      time(s"vocab_build_$tag") { Vocab.vocabBuild(docs) }
      time(s"corpus_shuffle_$tag") { CorpusShuffle.corpusShuffle(docs) }
      // round-8 closing: version diff (two map sides + full-outer join),
      // mixture compile (two token passes + stratum window), overlapping
      // chunker (map + generator, output-amplified), and the cross-source
      // overlap matrix (distinct + shingle self-join — the Σ k² candidate
      // join is the one with a nonlinear term, k bounded by |sources|)
      time(s"corpus_diff_$tag") {
        CorpusDiff.corpusDiff(CorpusDiff.oldSnapshot(docs), CorpusDiff.newSnapshot(docs))
      }
      // bloom semi-join dial, honest both-settings timing: at this batch
      // fraction (20% of corpus) the sketch build is a real fixed cost —
      // the dial's regime is steady-state small batches vs a huge index
      time(s"paragraph_incr_plain_$tag") { ParagraphDedup.paragraphIncremental(docs) }
      time(s"paragraph_incr_bloom_$tag") {
        ParagraphDedup.paragraphIncremental(docs, bloomFpp = Some(0.01))
      }
      time(s"mixture_plan_$tag") { MixturePlan.mixturePlan(docs) }
      time(s"dup_passages_$tag") { DupPassages.dupPassages(docs) }
      time(s"shard_manifest_$tag") { ShardManifest.shardManifest(docs) }
      time(s"tokenize_ids_$tag") { TokenizeIds.tokenizeIds(docs) }
      time(s"doc_chunk_$tag") { DocChunk.docChunk(docs) }
      time(s"source_overlap_$tag") { SourceOverlap.sourceOverlap(docs) }
      // round-8 continuation: span merge + clean (both ride the verdict
      // machinery), per-window language rollup, and collocation mining
      time(s"dup_span_merge_$tag") { DupSpans.dupSpanMerge(docs) }
      // round 12: suffix-granularity substring dedup — the rotation
      // replicas make the stride-1 gram stream maximally duplicate-dense
      // (every replica shares every gram with 9 siblings up to rotation),
      // the adversarial direction for the count-per-gram window
      time(s"dedup_substring_$tag") { SubstringDedup.substringDedup(docs) }
      time(s"substring_clean_$tag") { SubstringDedup.substringClean(docs) }
      time(s"substring_incr_$tag") { SubstringDedup.substringIncremental(docs) }
      // round 12: index maintenance economics — the batch delta vs the
      // full re-mine it replaces (the mine-once shape's steady state)
      time(s"pair_index_full_$tag") { Dedup.pairIndex(docs) }
      time(s"pair_index_delta_$tag") { Dedup.pairIndexDelta(docs) }
      time(s"paragraph_clean_$tag") { ParagraphClean.paragraphClean(docs) }
      time(s"lang_mix_$tag") { LangMix.langMix(docs) }
      time(s"bigram_pmi_$tag") { Collocations.bigramPmi(docs) }
      // round-8 continuation: winnowing (map-only index build), its
      // Σ df² containment join (the near-dup replicas make the fp index
      // denser at 10× — the adversarial direction), and the coverage curve
      time(s"winnow_fingerprint_$tag") { Winnow.winnowFingerprint(docs) }
      time(s"winnow_overlap_$tag") { Winnow.winnowOverlap(docs) }
      time(s"vocab_coverage_$tag") { VocabCoverage.vocabCoverage(docs) }
      // round-8 continuation (2nd session): bigram-LM scoring (the pair
      // stream runs twice by design — train agg + scoring probe; replicas
      // densify the count table, the adversarial direction), the char
      // run-length fold (pure map), and the cross-split near-dup audit
      // (the exact pair miner's Σ df² + two split join-backs)
      time(s"lm_score_$tag") { LmScore.lmScore(docs) }
      time(s"char_diversity_$tag") { CharDiversity.charDiversity(docs) }
      time(s"split_leakage_$tag") { SplitLeakage.splitLeakage(docs) }
      // round-8 continuation (3rd session): distribution analytics
      // (vocab-bounded join stages after one token-stream agg each),
      // the broadcast-lexicon labeler, the stratified rank pair, and
      // the fingerprint-join CDC merge
      time(s"vocab_drift_$tag") {
        VocabDrift.vocabDrift(CorpusDiff.oldSnapshot(docs), CorpusDiff.newSnapshot(docs))
      }
      time(s"source_divergence_$tag") { SourceDivergence.sourceDivergence(docs) }
      time(s"topic_classify_$tag") { TopicClassify.topicClassify(docs) }
      // round 13: the privacy trio's distribution member — the topic
      // pass dominates; census + EMD run on |classes|·m rows
      time(s"t_closeness_$tag") {
        graft.operators.TCloseness.tClosenessAudit(docs)
      }
      // round 13: the partition advisor — one GROUPING SETS Expand pass
      time(s"partition_plan_$tag") {
        graft.operators.PartitionPlan.partitionPlan(docs)
      }
      // round 13: rank-frequency probe — one unigram count + vocab window
      time(s"zipf_check_$tag") {
        graft.operators.ZipfCheck.zipfCheck(docs)
      }
      time(s"quality_ensemble_$tag") { QualityEnsemble.qualityEnsemble(docs) }
      time(s"sample_quota_$tag") { SampleQuota.sampleQuota(docs) }
      time(s"cdc_apply_$tag") { Cdc.cdcApply(docs, Cdc.changeBatch(docs)) }
      time(s"span_quality_$tag") { SpanQuality.spanQuality(docs) }
      // round-8 continuation 4: the session's corpus-scaled additions —
      // skipgram's K×token pair explode is the heaviest new map volume;
      // weights/repair ride the LSH cluster pipeline over denser dup graphs
      time(s"skipgram_$tag") { Skipgram.skipgramCooccur(docs) }
      time(s"dedup_weights_$tag") { DedupWeights.dedupWeights(docs) }
      time(s"split_repair_$tag") { SplitRepair.splitRepair(docs) }
      time(s"profile_drift_$tag") { ProfileDrift.profileDrift(docs) }
      // round-8 continuation 5: the session's two corpus-scaled additions —
      // fertility rides the tokenize stream + a doc-keyed spine join;
      // threshold_sweep pays the τ=0 pair stream (denser than the shipped
      // 0.8 contract: EVERY intersecting pair reaches the sweep agg —
      // the adversarial direction for the near-dup replicas)
      time(s"tokenizer_fertility_$tag") { TokenizerFertility.tokenizerFertility(docs) }
      time(s"threshold_sweep_$tag") { ThresholdSweep.dedupThresholdSweep(docs) }
      time(s"threshold_sweep_maxdf_$tag") {
        ThresholdSweep.dedupThresholdSweep(docs, maxDf = Some(1000L))
      }
      // round 17: the asymmetric algebra — same τ=0 mine + a map (its
      // cost class IS threshold_sweep's pair stream); the incremental
      // form pays only batch-touching joins
      time(s"containment_$tag") { Dedup.containmentPairs(docs) }
      time(s"containment_incremental_$tag") { Dedup.containmentIncremental(docs) }
      // round 10: the session's corpus-scaled additions — the θ-sampled
      // heavy hitters (map-side sample kill + vocab-bounded top-K), the
      // window skyline (one per-source sort), the shared-shingle
      // pagerank (catalog-bounded edges, K broadcast rounds), the
      // one-scan expectations contract, and the df-band calibrator
      // (histogram windows after one shingle exchange)
      time(s"freq_sketch_$tag") { graft.operators.FreqSketch.freqSketch(docs) }
      time(s"pareto_front_$tag") { graft.operators.ParetoFront.paretoFront(docs) }
      time(s"source_pagerank_$tag") { graft.operators.SourceRank.sourcePagerank(docs) }
      time(s"expectations_$tag") { graft.operators.Expectations.expectationsReport(docs) }
      time(s"band_plan_$tag") { graft.operators.BandPlan.prefixBandPlan(docs) }
      // round 10 (closing session): the IVM refresh (batch-sized probe +
      // |groups| merge — should be flat in the view merge, linear in the
      // probe), BM25 (keyword_search's shape + one map-side length pass),
      // the triangle census (inherits the pair miner's Σ df², then the
      // orientation-bounded wedge join — pairs grow ~45× on the near-dup
      // replicas, the adversarial direction), and the ORC round-trip
      // (pure write+scan, the format tax measured directly)
      time(s"ivm_$tag") { graft.operators.Ivm.incrementalViewMaintainQ(docs) }
      time(s"bm25_$tag") { graft.operators.Bm25.bm25Rank(docs) }
      time(s"triangles_$tag") { graft.operators.Triangles.dedupTrianglesQ(docs) }
      time(s"orc_roundtrip_$tag") { graft.operators.OrcRoundtrip.orcRoundtripQ(docs) }
    }

    // round 10: embeddings-side — the power iteration at 10× vectors
    // (replicas perturb one milli-component so quantized vectors are not
    // byte-identical; the principal axis is unchanged in the limit)
    val emb = Tables.embeddings(spark, baseDir)
    val emb10 = emb.withColumn("r", explode(expr("sequence(0, 9)")))
      .select((col("vec_id") * lit(10L) + col("r")).as("vec_id"),
        expr("transform(embedding, (e, i) -> CAST(e + CASE WHEN i = r % size(embedding) THEN 0.001 ELSE 0.0 END AS FLOAT))")
          .as("embedding"),
        col("label"))
    val e10 = materialize(emb10, "emb10x")
    for ((tag, e) <- Seq("1x" -> emb, "10x" -> e10)) {
      time(s"embedding_principal_$tag") {
        graft.operators.EmbeddingPrincipal.embeddingPrincipal(e)
      }
      // round 14: the mutual-kNN family — exact (corpus×corpus contract,
      // expected ~quadratic growth) vs the LSH candidate path at the gate
      // probe width (Σ bucket² — the 100 TB shape)
      time(s"knn_mutual_$tag") {
        graft.operators.KnnMutual.knnMutual(e)
      }
      time(s"knn_mutual_lsh_$tag") {
        graft.operators.KnnMutual.knnMutualLsh(
          e, multiProbe = graft.operators.KnnMutual.MutualProbeGate)
      }
    }

    spark.stop()
  }
}
