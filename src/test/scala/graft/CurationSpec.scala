package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Curation operators (round 6): eval-set decontamination, intra-doc
  * repetition gates, stratified quality selection, token-budget packing.
  * Each test pins either an independent recomputation (the map-side logic
  * vs a relational form computed in Spark itself) or the load-bearing plan
  * shape.
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("contamination_check: hashed probe equals exact string-set intersection") {
    // the operator joins on xxhash64(gram) for shuffle width; recompute the
    // hit counts joining on the gram STRING and require identical results —
    // this guards both the hash-collision risk and the split/slice logic
    val out = Curation.contaminationCheck(docs)
      .select("doc_id", "n_grams", "n_hit").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val g = Curation.ngramSets(docs, Curation.ContamN)
    val isBench = col("doc_id") % Curation.ContamBenchMod === Curation.ContamBenchRem
    val benchSet = g.filter(isBench).select(explode(col("grams")).as("gram")).distinct()
    val expected = g.filter(!isBench)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(benchSet, Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 7: n_grams is counted from the exploded stream (single-scan
    // form) — cross-check it against the gram ARRAY size per doc
    val expectedNg = g.filter(!isBench)
      .select(col("doc_id"), col("n_grams")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { case (id, ng, nHit) =>
      assert(nHit == expected.getOrElse(id, 0L),
        s"doc $id: hashed probe n_hit=$nHit != exact ${expected.getOrElse(id, 0L)}")
      assert(ng == expectedNg(id), s"doc $id: exploded-count n_grams=$ng != array size")
      assert(nHit >= 0 && nHit <= ng)
    }
    assert(out.map(_._1).toSet == expectedNg.keySet)
    assert(expected.nonEmpty) // some doc shares at least one 8-gram
  }

  test("contamination_check: flags exactly the near-verbatim leaks, bench excluded") {
    val rows = Curation.contaminationCheck(docs).collect()
    // no benchmark doc may appear in the output
    assert(rows.forall(r =>
      r.getAs[Long]("doc_id") % Curation.ContamBenchMod != Curation.ContamBenchRem))
    val contaminated = rows.filter(_.getAs[Boolean]("contaminated"))
    // the gate corpus plants near-dup docs straddling the %20==7 split —
    // at 8-gram width those (and only those) cross the 0.2 threshold, with
    // near-total overlap; everything else has ratio ~0
    assert(contaminated.nonEmpty, "expected at least one planted leak")
    contaminated.foreach { r =>
      assert(r.getAs[Double]("overlap_ratio") > 0.9,
        s"contaminated doc ${r.getAs[Long]("doc_id")} should be a near-verbatim leak")
    }
    rows.filterNot(_.getAs[Boolean]("contaminated")).foreach { r =>
      assert(r.getAs[Double]("overlap_ratio") < Curation.ContamThreshold)
    }
  }

  test("contamination_check plan: benchmark set is broadcast, no shuffle on gram") {
    val plan = Curation.contaminationCheck(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe should broadcast the bench set:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"gram probe must not sort-merge (corpus-wide gram shuffle):\n$plan")
  }

  test("doc_novelty: planted near-dups score ~0, fresh docs ~1, totals recompute") {
    val rows = Curation.docNovelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length == docs.count(), "every doc must emit a row")
    rows.foreach { case (id, ng, nn, ratio, allNovel) =>
      assert(nn >= 0 && nn <= ng, s"doc $id: n_novel $nn out of [0, $ng]")
      assert(allNovel == (nn == ng), s"doc $id: all_novel flag inconsistent")
      assert(math.abs(ratio - nn.toDouble / math.max(ng, 1)) < 1e-12)
    }
    // the corpus plants near-dup pairs: the LATER member of each pair must
    // score ~0 (its grams were seen at the earlier member), and at 8-gram
    // width everything unplanted is fully novel
    val lows = rows.filter(r => r._2 > 0 && r._4 < 0.5)
    assert(lows.nonEmpty, "expected the planted later near-dups to score low")
    assert(rows.count(_._5) > rows.length / 2, "most docs should be fully novel")
    // independent recomputation via the exact-string relational path
    val g = Curation.ngramSets(docs, Curation.ContamN)
    val expected = g.select(col("doc_id"), explode(col("grams")).as("gram"))
      .groupBy("gram").agg(min("doc_id").as("fd"))
      .groupBy("fd").agg(count(lit(1)).as("nn"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, _, nn, _, _) =>
      assert(nn == expected.getOrElse(id, 0L), s"doc $id: n_novel $nn != exact recount")
    }
  }

  test("doc_novelty: degenerate docs emit 0/0/0.0/all_novel=true; plan reads the materialized index") {
    import spark.implicits._
    val d = Seq((1L, "too short for an eight gram"), (2L, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val out = Curation.docNovelty(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(out(1L) == ((0L, 0L, 0.0, true)), "no-gram doc: pinned degenerate convention")
    assert(out(2L)._1 == 3L && out(2L)._4, "10-token doc has 3 novel 8-grams")
    // both aggregations must consume the checkpointed gram index — the
    // final plan re-plans NO generate and NO gram transform
    val plan = Curation.docNovelty(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Generate") && !plan.contains("array_distinct"),
      s"aggs must read the materialized index, not re-plan the explode:\n$plan")
    assert(plan.contains("Scan ExistingRDD"), s"expected checkpoint scans:\n$plan")
  }

  test("doc_ngram_repetition: map-side higher-order stats equal relational form") {
    val out = Curation.ngramRepetition(docs)
      .select("doc_id", "n2", "d2", "top2", "n3", "d3").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toMap
    // independent relational recomputation: explode + two aggregations
    val w2 = docs
      .select(col("doc_id"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
      .select(col("doc_id"),
        explode(expr("transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', w[i + 1]))")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(sum("c").as("n2"), count(lit(1)).as("d2"), max("c").as("top2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    w2.foreach { case (id, (n2, d2, top2)) =>
      val (mn2, md2, mtop2, _, _) = out(id)
      assert(mn2.toLong == n2 && md2.toLong == d2 && mtop2.toLong == top2,
        s"doc $id: map-side ($mn2,$md2,$mtop2) != relational ($n2,$d2,$top2)")
    }
    assert(out.keySet == w2.keySet)
  }

  test("doc_ngram_repetition plan: pure map pass, zero exchanges") {
    val plan = Curation.ngramRepetition(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition stats should be map-only:\n$plan")
  }

  test("quality_select: within each lang, every selected doc outranks every unselected") {
    val rows = Curation.qualitySelect(docs)
      .select(col("lang"), expr(graft.operators.Parity.rexpr("quality_score", 4)).as("qs"),
        col("selected"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sel = rs.filter(_._3).map(_._2)
      val unsel = rs.filterNot(_._3).map(_._2)
      assert(sel.nonEmpty && unsel.nonEmpty, s"$lang: selection should split the stratum")
      // rounded-score ordering with doc_id tie-break: a tie can straddle the
      // boundary, so the invariant is min(selected) >= max(unselected)
      assert(sel.min >= unsel.max,
        s"$lang: selected min ${sel.min} < unselected max ${unsel.max}")
      // the quantile cut keeps roughly the configured fraction
      val frac = sel.length.toDouble / rs.length
      assert(frac > 0.35 && frac < 0.65, s"$lang: selected fraction $frac")
    }
  }

  test("contamination_check plan: the corpus gram transform runs ONCE (single-scan form)") {
    // round 7 (advice): n_grams and the hit probe derive from ONE exploded
    // gram stream. The expensive split+concat+array_distinct transform must
    // appear exactly twice in the plan — once for the benchmark side, once
    // for the corpus side — never a third time for a separate counts pass.
    val plan = Curation.contaminationCheck(docs).queryExecution.executedPlan.toString
    val gramSites = plan.linesIterator.count(_.contains("array_distinct"))
    assert(gramSites == 2, s"expected bench + corpus gram transforms only, got $gramSites:\n$plan")
  }

  test("doc_ngram_repetition: degenerate docs emit counts 0, ratios 0, keep=true") {
    import spark.implicits._
    // pinned convention (both engines): no bigrams/trigrams → 0s, never
    // NULL, keep=true; a 2-token doc has one bigram (top2_frac 1.0 → gated)
    // and still zero trigrams. A NULL-text doc (round-8 advice) must hit
    // the SAME all-zero convention — the token array coalesces to empty,
    // so no size(NULL)/aggregate(NULL) half-NULL row can leak out.
    val d = Seq((1L, "one", "en", "s", 3L), (2L, "two words", "en", "s", 9L),
      (3L, null, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.ngramRepetition(d)
      .select("doc_id", "n2", "d2", "top2", "n3", "d3",
        "dup2_ratio", "top2_frac", "dup3_ratio", "keep_repetition")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 3, "every doc must emit a row, however short")
    for (id <- Seq(1L, 3L)) {
      val r1 = out(id)
      assert(r1.getInt(1) == 0 && r1.getInt(2) == 0 && r1.getInt(3) == 0 &&
        r1.getInt(4) == 0 && r1.getInt(5) == 0, s"doc $id counts")
      assert(r1.getDouble(6) == 0.0 && r1.getDouble(7) == 0.0 && r1.getDouble(8) == 0.0,
        s"doc $id ratios")
      assert(r1.getBoolean(9), s"degenerate doc $id must keep=true, not NULL")
    }
    val r2 = out(2L)
    assert(r2.getInt(1) == 1 && r2.getInt(3) == 1 && r2.getInt(4) == 0)
    assert(r2.getDouble(7) == 1.0 && !r2.getBoolean(9))
    assert(r2.getDouble(8) == 0.0)
  }

  test("quality_select: two-pass scale form is row-identical to the window reference form") {
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "quality_score", "pct_rank", "selected")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    val scale = rows(Curation.qualitySelect(docs))
    val window = rows(Curation.qualitySelectWindow(docs))
    assert(scale.keySet == window.keySet)
    // pct_rank must match BIT-identically: both are one division of the
    // same exact integers ((rows before) / (n-1)) — this is what lets the
    // two forms share one DuckDB oracle
    scale.foreach { case (id, s) =>
      assert(s == window(id), s"doc $id: scale $s != window ${window(id)}")
    }
  }

  test("scale forms keep NULL-keyed rows the window forms keep (null-safe joins)") {
    import spark.implicits._
    // NULL lang and NULL text (→ NULL score → NULL qs4) form their own
    // stratum/tie bucket in the window forms; the scale forms' histogram/
    // offset joins must match those NULL groups, not drop the rows — the
    // round-7 review caught plain equi-joins doing exactly that
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "a", 43L),
      (2L, "a b c d e f g h i j", null, "a", 19L),
      (3L, null, "en", null, 0L),
      (4L, "one two three four five six seven of the and", "en", "b", 44L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def qRows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "pct_rank", "selected").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
    val qs = qRows(Curation.qualitySelect(d))
    assert(qs.map(_._1).sameElements(Array(1L, 2L, 3L, 4L)),
      s"two-pass form dropped NULL-keyed rows: ${qs.mkString(",")}")
    assert(qs.sameElements(qRows(Curation.qualitySelectWindow(d))),
      "two-pass != window on the NULL-bearing corpus")
    def pRows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "source", "cum_tokens", "packed").collect()
      // cum_tokens/packed are NULL for a NULL-text doc (NULL bpe count) —
      // read nullable, the parity requirement is both forms agreeing
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        Option(r.getAs[java.lang.Boolean](3)))).sortBy(_._1)
    val pr = pRows(Curation.tokenBudgetPackRange(d, numParts = 3))
    assert(pr.map(_._1).sameElements(Array(1L, 2L, 3L, 4L)),
      s"range form dropped NULL-source rows: ${pr.mkString(",")}")
    assert(pr.sameElements(pRows(Curation.tokenBudgetPack(d))),
      "range != window on the NULL-bearing corpus")
    // NULL-bpe docs INSIDE a populated source, swept across partition
    // counts so some split lands a NULL row at the head of a non-first
    // slice — the window form gives it the prior rows' running sum, and
    // the range form must too (not NULL + offset = NULL; round-7 review)
    val d2 = (1L to 12L).map { i =>
      val text = if (i % 4 == 0) null else s"w$i " * i.toInt
      (i, text, "en", "src", i)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val w2 = pRows(Curation.tokenBudgetPack(d2))
    for (parts <- 1 to 8) {
      val r2 = pRows(Curation.tokenBudgetPackRange(d2, numParts = parts))
      assert(r2.sameElements(w2),
        s"parts=$parts: range ${r2.mkString(",")} != window ${w2.mkString(",")}")
    }
  }

  test("quality_select plan: no percent_rank, doc-row window partitioned by tie bucket") {
    val plan = Curation.qualitySelect(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("percent_rank"),
      s"scale form must not compute percent_rank over doc rows:\n$plan")
    // the only doc-row window is the tie-break row_number, and its partition
    // spec must include the score bucket — a lang-only partition would be
    // the one-reducer-per-stratum shape this form exists to remove
    val rn = plan.linesIterator.filter(_.contains("row_number")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("qs4")),
      s"row_number window must partition by (lang, qs4):\n$plan")
  }

  test("contamination_check: empty benchmark partition yields zero hits, not nulls") {
    import spark.implicits._
    // no doc_id % 20 == 7 → the broadcast bench set is empty; every corpus
    // doc must come back n_hit=0 / ratio 0.0 / contaminated=false
    val d = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val out = Curation.contaminationCheck(d).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_hit") == 0L)
      assert(r.getAs[Double]("overlap_ratio") == 0.0)
      assert(!r.getAs[Boolean]("contaminated"))
    }
  }

  test("token_budget_pack: a first doc alone over budget packs nothing from its source") {
    import spark.implicits._
    val big = ("x " * 1000).trim // 1000 bpe tokens > 800 budget
    val d = Seq((1L, big, "en", "solo", big.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curation.tokenBudgetPack(d).collect()
    assert(out.length == 1 && !out.head.getAs[Boolean]("packed"))
  }

  test("tfidf_topterms: ranks are dense per doc, scores descend, tf recounts exactly") {
    val rows = Curation.tfidfTopTerms(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5)))
    // Scala-side recount of tf and df from the raw text — independent of
    // the Spark aggregation path
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tokensOf = texts.view.mapValues(_.trim.toLowerCase.split("\\s+").toSeq).toMap
    val dfOf = tokensOf.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    rows.groupBy(_._1).foreach { case (id, rs) =>
      assert(rs.map(_._6).sorted.sameElements(1 to rs.length), s"doc $id ranks not dense")
      val byRank = rs.sortBy(_._6)
      assert(byRank.map(_._5).sameElements(byRank.map(_._5).sorted.reverse),
        s"doc $id scores not descending")
      rs.foreach { case (_, term, tf, df, _, _) =>
        assert(tf == tokensOf(id).count(_ == term).toLong,
          s"doc $id term '$term': tf $tf != recount")
        assert(df == dfOf(term).toLong, s"term '$term': df $df != recount")
      }
    }
    assert(rows.groupBy(_._1).size == texts.size, "every doc should emit top terms")
  }

  test("tfidf_topterms df join degrade dial: broadcastDf=false shuffles, same rows") {
    // round 8 (verdict): the df frame is VOCABULARY-sized — at open-vocab
    // scale (urls/ids/code literals) it grows with the corpus, so the
    // broadcast hint must be a dial: false degrades the join-back to a
    // term-keyed shuffle join, rows identical.
    def rows(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.select("doc_id", "term", "tf", "df", "rank").collect().map(_.toString).sorted
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = Curation.tfidfTopTerms(docs, broadcastDf = false)
      val p = shuffled.queryExecution.executedPlan.toString
      // N's 1-row cross join legitimately stays broadcast; the df JOIN must
      // not — no BroadcastHASHjoin may remain (the N ride is nested-loop)
      assert(!p.contains("BroadcastHashJoin"),
        s"broadcastDf=false must shuffle the df join:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"df join should degrade to a shuffled equi-join:\n$p")
      assert(rows(shuffled).sameElements(rows(Curation.tfidfTopTerms(docs))),
        "dial changed the output rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("corpus_report: per-source counts recompute from corpus_filter rows") {
    val report = Curation.corpusReport(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))).toMap
    val perDoc = graft.operators.TextOps.corpusFilter(docs)
      .select("source", "keep_quality", "keep_lang", "is_canonical", "admitted",
        "quality_score")
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getDouble(5)))
    perDoc.groupBy(_._1).foreach { case (src, ds) =>
      val (nDocs, nQ, nL, nC, nA, _, meanQ) = report(src)
      assert(nDocs == ds.length.toLong, s"$src n_docs")
      assert(nQ == ds.count(_._2).toLong, s"$src n_quality")
      assert(nL == ds.count(_._3).toLong, s"$src n_lang")
      assert(nC == ds.count(_._4).toLong, s"$src n_canonical")
      assert(nA == ds.count(_._5).toLong, s"$src n_admitted")
      val expectedMean = ds.map(d => math.round(d._6 * 10000.0)).sum.toDouble /
        ds.length / 10000.0
      assert(math.abs(meanQ - expectedMean) < 1e-4, s"$src mean_quality $meanQ vs $expectedMean")
    }
    assert(report.keySet == perDoc.map(_._1).toSet)
  }

  test("token_budget_pack: range-partitioned giant-source form is row-identical") {
    // round 7: the decomposed prefix sum (range partition + per-partition
    // totals + broadcast offsets + local running sum) must reproduce the
    // single-window cum_tokens EXACTLY, at several partition counts —
    // including 1 (degenerate: offsets all 0) and more partitions than the
    // corpus needs
    val expected = Curation.tokenBudgetPack(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getString(3),
        r.getLong(4), r.getBoolean(5))).toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = Curation.tokenBudgetPackRange(docs, numParts = parts).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getString(3),
          r.getLong(4), r.getBoolean(5))).toMap
      assert(got.keySet == expected.keySet, s"parts=$parts row set differs")
      got.foreach { case (id, g) =>
        assert(g == expected(id), s"parts=$parts doc $id: $g != ${expected(id)}")
      }
    }
    // and the doc-row window of the range form partitions by (source, pid),
    // never by source alone — no single-reducer source anywhere
    val plan = Curation.tokenBudgetPackRange(docs, numParts = 7)
      .queryExecution.executedPlan.toString
    // the doc-row running sum is the only currentrow-framed window (the
    // offsets window over the tiny totals frame ends at -1)
    val docWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("currentrow")).toSeq
    assert(docWindows.nonEmpty && docWindows.forall(_.contains("pid")),
      s"running-sum window must partition by (source, pid):\n$plan")
  }

  test("token_budget_pack: packed set is the maximal budget-feasible prefix per source") {
    val rows = Curation.tokenBudgetPack(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("pack_key"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("bpe_tokens"),
        r.getAs[Long]("cum_tokens"), r.getAs[Boolean]("packed")))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val ordered = rs.sortBy(t => (t._2, t._3)) // (pack_key, doc_id) order
      var running = 0L
      ordered.foreach { case (_, _, id, bpe, cum, packed) =>
        running += bpe
        assert(cum == running, s"$src doc $id: cum_tokens $cum != running $running")
        // cum is monotone in this order, so packed == (cum <= budget) IS the
        // maximal-prefix property
        assert(packed == (running <= Curation.BudgetPerSource),
          s"$src doc $id: packed=$packed, cum=$running")
      }
      assert(ordered.exists(_._6) && ordered.exists(!_._6),
        s"$src: budget should split the source")
    }
  }
}
