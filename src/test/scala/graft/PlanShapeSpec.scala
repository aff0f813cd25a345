package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CsvIngest, Curation, Dedup, Lsh, SignalOps, SubstringDedup, TextOps}

/** Locks PERF.md's load-bearing plan-shape claims into `sbt test`, so the
  * class of silent plan regression that bit round 3 (an iterative self-join
  * consuming an unmaterialized input and re-planning its upstream every
  * round) fails here instead of in a bench run.
  *
  * Claims pinned (PERF.md "Headline plan facts"):
  *  - signal chain bronze→silver→epoch→wide runs on ONE data exchange
  *    (hash(trial_id) satisfies every downstream window/agg);
  *  - csv_ingest is map-only — zero exchanges;
  *  - corpus_filter is one fused map pass + ONE fingerprint exchange;
  *  - dedup_ngram_jaccard joins sizes back as broadcast dims and its
  *    candidate self-join is a hash/merge join, never a nested loop;
  *  - dedup_cluster's CC loop returns a materialized checkpoint, and each
  *    round's pointer jump joins two scans of the SAME materialized frame
  *    (an unmaterialized round input re-plans the edge join + neighbor-min
  *    agg on both sides of the jump — the measured round-3 failure mode).
  *
  * Counting method: node-name prefixes on `executedPlan.toString` lines,
  * captured BEFORE any action (an executed AQE plan prints final+initial
  * trees and would double-count).
  */
class PlanShapeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  /** Tree-prefix-stripped node lines of the physical plan. */
  private def nodeLines(plan: String): Seq[String] =
    plan.linesIterator.map(_.dropWhile(c => !c.isLetter && !c.isDigit)).toSeq

  /** Nodes whose name starts with `prefix` ("Exchange" does NOT match
    * "BroadcastExchange" — distinct node-name prefixes). */
  private def count(plan: String, prefix: String): Int =
    nodeLines(plan).count(_.startsWith(prefix))

  test("signal chain runs on exactly ONE data exchange end-to-end") {
    val events = Tables.events(spark, sf)
    val wide = SignalOps.featureWide(SignalOps.epochFeatures(SignalOps.silver(events)))
    val p = planOf(wide)
    assert(count(p, "Exchange") == 1, s"expected 1 shuffle exchange:\n$p")
    assert(count(p, "BroadcastExchange") == 0, s"unexpected broadcast:\n$p")

    // the gold branch shares the same single-exchange shape
    val gold = SignalOps.goldTrialStats(SignalOps.silver(events))
    val pg = planOf(gold)
    assert(count(pg, "Exchange") == 1, s"expected 1 shuffle exchange:\n$pg")
  }

  test("csv_ingest is map-only: zero exchanges, files as the parallelism unit") {
    val p = planOf(CsvIngest.csvIngest(spark, CsvIngest.FixtureDir))
    assert(count(p, "Exchange") == 0 && count(p, "BroadcastExchange") == 0,
      s"csv_ingest must not shuffle:\n$p")
  }

  test("corpus_filter is one fused map pass + ONE fingerprint exchange") {
    val p = planOf(TextOps.corpusFilter(Tables.documents(spark, sf)))
    assert(count(p, "Exchange") == 1, s"expected exactly the fingerprint exchange:\n$p")
    assert(count(p, "BroadcastExchange") == 0, s"unexpected broadcast:\n$p")
    assert(count(p, "Window") == 1, s"expected the single canonical-id window:\n$p")
  }

  test("dedup_ngram_jaccard: sizes join back broadcast, candidate join is a hash/merge join") {
    // auto-broadcast off so toy-SF size estimates can't hand the candidate
    // self-join a broadcast plan the real scale would never get — only the
    // explicit broadcast() hints on the sizes dims may broadcast
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf(Dedup.ngramJaccardPairs(Tables.documents(spark, sf)))
      assert(count(p, "BroadcastHashJoin") == 2,
        s"sizes must join back as two broadcast dims:\n$p")
      assert(count(p, "SortMergeJoin") + count(p, "ShuffledHashJoin") == 1,
        s"candidate self-join must be the one shuffled equi-join:\n$p")
      assert(count(p, "CartesianProduct") == 0 && count(p, "BroadcastNestedLoopJoin") == 0,
        s"no nested-loop anywhere in the pair path:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("explode stages carry no inferred filter recomputing the generator input") {
    // InferFiltersFromGenerate + pushdown inlines a NAMED generator column's
    // defining expression into a scan-side Filter, recomputing the array 3×
    // per row (measured 11× wall on the 8-gram stage, 3.3× on bigrams —
    // PERF.md). The fix keeps the array expression inline as the Generate
    // child, where no filter is inferred. These pins fail if any of the
    // four production explode sites regresses to the named-column shape.
    def filterLines(plan: String): Seq[String] =
      plan.linesIterator.filter(_.contains("Filter ")).toSeq
    val docs = Tables.documents(spark, sf)

    val pSh = planOf(Dedup.shingleExploded(docs))
    assert(!filterLines(pSh).exists(_.contains("array_distinct")),
      s"shingle explode re-grew an inferred filter recomputing the shingle array:\n$pSh")

    val pContam = planOf(Curation.contaminationCheck(docs))
    assert(!filterLines(pContam).exists(_.contains("array_distinct")),
      s"contamination probe re-grew an inferred gram-recompute filter:\n$pContam")

    val pLshB = planOf(Lsh.lshBuckets(Tables.embeddings(spark, sf)))
    assert(!filterLines(pLshB).exists(_.contains("graft_dot")),
      s"lshBuckets re-grew an inferred filter recomputing the hyperplane dots:\n$pLshB")

    val pCsv = planOf(CsvIngest.csvIngest(spark, CsvIngest.FixtureDir))
    assert(!filterLines(pCsv).exists(_.contains("slice(")),
      s"csv_ingest re-grew an inferred filter recomputing the samples slice:\n$pCsv")
  }

  test("dedup_substring: no window over the gram key, inline generators, bounded exchanges") {
    // round 12 (semi-join verdict): the load-bearing shape claims are
    // (a) NO WindowExec partitioned by the gram key — a hot boilerplate
    // gram must stay AQE-splittable, never pinned to one window
    // partition; (b) exactly TWO generators (the gram stream's two map
    // passes — count side + probe side, the documented two-pass trade),
    // each with the gram array inline (no inferred recompute filter);
    // (c) at most 4 shuffles: gram-count agg, probe join (collapses to a
    // broadcast at gate sizes — unhinted, AQE's call), doc-keyed islands
    // (whose hash(doc_id) also satisfies the (doc_id, grp) aggregation —
    // the DupSpans argument), final orderBy.
    val p = planOf(SubstringDedup.substringDedupQ(Tables.documents(spark, sf)))
    assert(!p.linesIterator.exists(l => l.contains("Window") && l.contains("gh#")),
      s"a window over the gram key re-appeared (un-splittable hot partitions):\n$p")
    assert(count(p, "Generate") == 2, s"expected the two gram map passes:\n$p")
    assert(count(p, "Exchange") <= 4, s"unexpected extra shuffles:\n$p")
    assert(!p.linesIterator.filter(_.contains("Filter "))
      .exists(_.contains("transform(")),
      s"substring gram explode re-grew an inferred gram-recompute filter:\n$p")
  }

  /** 63-edge chain over 64 vertices: worst-case diameter for the size,
    * converges in ≤9 pointer-jump rounds (same fixture family as the
    * convergence spec). */
  private def chainFixture(n: Long): (DataFrame, DataFrame) = {
    import spark.implicits._
    val docs = (0L until n).toDF("doc_id")
    val fwd = (0L until n - 1).map(i => (i, i + 1)).toDF("id1", "id2")
    val edges = fwd.unionAll(fwd.select(col("id2").as("id1"), col("id1").as("id2")))
    (docs, edges)
  }

  test("CC labels come back as a materialized checkpoint scan, not a lineage tree") {
    val (docs, edges) = chainFixture(64)
    val (labels, iters) = Dedup.propagateMinLabels(docs, edges, 20)
    val p = planOf(labels)
    // the whole iterative history must be materialized away: no joins, no
    // exchanges, no re-scan of the inputs — just the final checkpoint RDD
    assert(p.contains("Scan ExistingRDD"), s"labels must scan the checkpoint:\n$p")
    assert(count(p, "Exchange") == 0 && count(p, "BroadcastExchange") == 0,
      s"label lineage leaked an exchange:\n$p")
    assert(!nodeLines(p).exists(_.contains("Join")), s"label lineage leaked a join:\n$p")
    assert(iters <= 9, s"pointer jumping should close a 64-chain in ≤9 rounds, took $iters")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64 && got.values.forall(_ == 0L), "chain must collapse to label 0")
  }

  test("CC pointer jump consumes a MATERIALIZED round input (round-3 regression pin)") {
    // the jump self-join must join two scans of the same checkpointed RDD;
    // if the checkpoint inside ccRound is dropped, the neighbor-min
    // aggregate + edge join re-plan on BOTH sides of the jump and show up
    // here as HashAggregate / extra joins in the round plan
    val (docs, edges) = chainFixture(64)
    val labels0 = docs.withColumn("label", col("doc_id")).localCheckpoint()
    val p = planOf(Dedup.ccRound(labels0, edges))
    assert(count(p, "HashAggregate") == 0 && count(p, "ObjectHashAggregate") == 0 &&
      count(p, "SortAggregate") == 0,
      s"neighbor-min agg leaked into the jump plan — prop not checkpointed:\n$p")
    val joins = nodeLines(p).count(l => l.contains("Join"))
    assert(joins == 1, s"jump round must contain exactly the one self-join:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"jump inputs must be checkpoint scans:\n$p")
  }

  test("lm_score consumes the checkpointed bigram model — the count agg runs once") {
    // the model frame (bigram counts) feeds TWO consumers: the c_x
    // derivation and the scoring lookup join. Checkpointed, both must read
    // Scan ExistingRDD; if the checkpoint is dropped, the whole
    // explode+count aggregation re-plans under EACH consumer and the
    // scoring plan grows a second pair-stream explode + agg chain
    import graft.operators.LmScore
    val docs = Tables.documents(spark, sf)
    val p = planOf(LmScore.lmScore(docs))
    assert(p.contains("Scan ExistingRDD"),
      s"scoring must consume the checkpointed model:\n$p")
    // generators in the plan: ONE pair explode for scoring + ONE unigram
    // explode for the vocab count — the model's own pair explode is
    // materialized away behind the checkpoint
    val generates = nodeLines(p).count(_.startsWith("Generate"))
    assert(generates == 2,
      s"expected exactly 2 live Generate sites (score pairs + vocab), got $generates:\n$p")
  }

  test("skipgram: map-side pair generation — two Generate sites, no position self-join") {
    // the naive form self-joins a positions frame (quadratic in doc
    // length, shuffles the corpus twice); the shipped form generates
    // pairs inside ONE inline nested-transform generator. Pin: exactly
    // ONE live Generate site (the pair explode — the unigram explode is
    // materialized away behind the uni checkpoint, the lm_score
    // pattern), no cartesian, and the only nested loop is the 1-row
    // n_tok fact
    import graft.operators.Skipgram
    val p = planOf(Skipgram.skipgramCooccur(Tables.documents(spark, sf)))
    val generates = nodeLines(p).count(_.startsWith("Generate"))
    assert(generates == 1, s"expected 1 live Generate site, got $generates:\n$p")
    assert(count(p, "CartesianProduct") == 0, s"cartesian in skipgram:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin") <= 1,
      s"only the 1-row total fact may nested-loop:\n$p")
  }

  test("rolling actives: the (user, day) distinct collapses volume BEFORE the x7 explode") {
    // exploding raw events first would 7x the corpus; the shipped form
    // explodes the distinct (user, day) frame. Pin: both Generate sites
    // (cover + axis) sit above an aggregate, i.e. every Generate's
    // subtree contains a HashAggregate before the scan
    import graft.operators.RollingActives
    val p = planOf(RollingActives.rollingActives(Tables.events(spark, sf)))
    val lines = nodeLines(p)
    val genIdx = lines.zipWithIndex.filter(_._1.startsWith("Generate")).map(_._2)
    assert(genIdx.size == 2, s"expected 2 Generate sites (axis + cover):\n$p")
    genIdx.foreach { i =>
      assert(lines.drop(i + 1).exists(_.startsWith("HashAggregate")),
        s"Generate at line $i must consume an aggregated frame, not raw events:\n$p")
    }
  }

  test("round-8c4 joins: no undocumented nested loops") {
    import graft.operators.{Conformance, ShipLatency, SplitRepair, Winsorize}
    val docs = Tables.documents(spark, sf)
    val events = Tables.events(spark, sf)
    Seq(
      "split_repair" -> SplitRepair.splitRepair(docs),
      "winsorize" -> Winsorize.winsorize(events),
      "transition_conformance" -> Conformance.transitionConformance(events),
      "ship_latency" -> ShipLatency.shipLatency(
        Tables.orders(spark, sf), Tables.lineitem(spark, sf))
    ).foreach { case (name, df) =>
      val p = planOf(df)
      assert(count(p, "BroadcastNestedLoopJoin") == 0 &&
        count(p, "CartesianProduct") == 0,
        s"$name must plan only equi joins:\n$p")
    }
  }

  test("zipf_check: rank window sees only the TakeOrdered probe frame, never the full vocab") {
    // the registered query checkpoints the ranked frame, hiding it from
    // every Explain sweep (r13 verdict) — pin the PRE-checkpoint plan: the
    // corpus-scale vocab must be cut by TakeOrderedAndProject (per-partition
    // top-N + driver merge) BEFORE the unpartitioned row_number window, so
    // the single-partition window input is ≤ 2·maxProbe rows by plan shape,
    // not by luck of a limit-pushdown rule firing.
    val docs = Tables.documents(spark, sf)
    val p = planOf(graft.operators.ZipfCheck.rankedProbes(docs))
    val lines = nodeLines(p)
    val winIdx = lines.indexWhere(_.startsWith("Window"))
    val topIdx = lines.indexWhere(_.startsWith("TakeOrderedAndProject"))
    assert(winIdx >= 0 && topIdx >= 0,
      s"expected a Window fed by TakeOrderedAndProject:\n$p")
    assert(topIdx > winIdx,
      s"TakeOrderedAndProject must sit BELOW the Window (feed it):\n$p")
    // the only Sort allowed is the window's own over the ≤128-row frame;
    // a second Sort would mean the full vocab is being globally ordered
    assert(count(p, "Sort") <= 1, s"unexpected full-vocab sort:\n$p")
  }
}
