package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Sessionize, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val events = Tables.events(spark, sf)

  test("incremental admission agrees with the full exact pair set on cross-split pairs") {
    // dedup_incremental must mark a batch doc (doc_id%5==0) as a dup iff
    // the FULL pair miner finds it a partner on the other side of the
    // split, and must pick the min such partner — derive the expectation
    // from ngramJaccardPairs and compare row-for-row
    val mod = Dedup.IncrementalBatchMod
    val pairs = Dedup.ngramJaccardPairs(docs).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (pairs.flatMap { case (a, b) =>
      Seq((a, b), (b, a)) // batch side first, either orientation
    }.filter { case (bid, cid) => bid % mod == 0 && cid % mod != 0 })
      .groupBy(_._1).map { case (bid, ps) => bid -> ps.map(_._2).min }
    val got = Dedup.dedupIncremental(docs).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val batchCount = docs.filter(col("doc_id") % mod === 0).count()
    assert(got.length == batchCount)
    got.foreach { case (bid, isNew, dupOf) =>
      assert(isNew == !expected.contains(bid), s"doc $bid is_new mismatch")
      assert(dupOf == expected.get(bid), s"doc $bid dup_of mismatch")
    }
    // the operator is only interesting if the gate corpus exercises both
    // branches (some admissions, some rejections)
    assert(got.exists(_._2) && got.exists(!_._2), "split exercises only one branch")
  }

  test("incremental admission broadcasts the batch shingle index") {
    val plan = Dedup.dedupIncremental(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("incremental admission degrade dial: broadcastBatch=false shuffles, same rows") {
    // round 7: the batch-side broadcast() is a dial, not a hard-coding — an
    // oversized batch must degrade to a shuffled equi-join, not OOM the
    // broadcast. With auto-broadcast off, the non-hinted form must plan NO
    // broadcast at all, and both settings must emit identical rows.
    def rows(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.select("doc_id", "is_new", "dup_of").collect().map(_.toString).sorted
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = Dedup.dedupIncremental(docs, broadcastBatch = false)
      val p = shuffled.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
        s"broadcastBatch=false must not broadcast anything:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"candidate join should degrade to a shuffled equi-join:\n$p")
      assert(rows(shuffled).sameElements(rows(Dedup.dedupIncremental(docs))),
        "dial changed the output rows")
      // the LSH twin carries the same dial — rows identical AND the
      // no-broadcast plan shape held (rows alone would pass even if a
      // hard broadcast() crept back onto the probe)
      val lshShuffled = Dedup.dedupIncrementalLsh(docs, broadcastBatch = false)
      val pl = lshShuffled.queryExecution.executedPlan.toString
      assert(!pl.contains("BroadcastHashJoin") && !pl.contains("BroadcastExchange"),
        s"LSH broadcastBatch=false must not broadcast anything:\n$pl")
      assert(rows(lshShuffled).sameElements(rows(Dedup.dedupIncrementalLsh(docs))),
        "LSH dial changed the output rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("jaccard sizes join-back degrade dial: broadcastSizes=false shuffles, same rows") {
    // round 8 (verdict): the sizes frame is ONE ROW PER DOCUMENT — the last
    // corpus-proportional broadcast hint in a shipped operator. At 10⁹ docs
    // it is an OOM, so it must be a dial: false drops both hints and the
    // join-back degrades to doc_id-keyed shuffle joins, rows identical.
    def rows(df: org.apache.spark.sql.DataFrame): Array[String] =
      df.select("id1", "id2", "n1", "n2", "inter").collect().map(_.toString).sorted
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = Dedup.ngramJaccardPairs(docs, broadcastSizes = false)
      val p = shuffled.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
        s"broadcastSizes=false must not broadcast anything:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
      assert(rows(shuffled).sameElements(rows(Dedup.ngramJaccardPairs(docs))),
        "dial changed the output rows")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
  }

  test("jaccard inverted-index join plans a hash join, not a cartesian product") {
    val plan = Dedup.ngramJaccardPairs(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  test("jaccard pairs on a seeded corpus find the planted near-dup only") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
      (3L, "completely different words appear in this document body")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(d, threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("containment flags the planted doc-in-doc pair the jaccard miner is blind to") {
    import spark.implicits._
    // doc 2 (4 bigrams) is fully embedded in doc 1 (7 bigrams):
    // containment 4/4 = 1.0, jaccard 4/7 ≈ 0.571 < 0.8 — the asymmetric
    // algebra's reason to exist, pinned in BOTH directions. doc 4 shares
    // one bigram with doc 1 (containment 1/3) and stays below the gate.
    val docs4 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "iota kappa lambda mu"),
      (4L, "alpha beta nu xi")).toDF("doc_id", "text")
    val cp = Dedup.containmentPairs(docs4).collect()
    assert(cp.length == 1, s"exactly the planted pair: ${cp.mkString(";")}")
    val r = cp.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getLong(5) == 2L, "contained_id = the smaller (embedded) side")
    assert(r.getDouble(6) == 1.0, "full embedding => containment exactly 1")
    assert(Dedup.ngramJaccardPairs(docs4).count() == 0L,
      "the jaccard miner at its own threshold misses the embedded doc")
  }

  test("containment inline == from the persisted pair index (row identity)") {
    val inline = Dedup.containmentQ(docs).collect().map(_.toString)
    val indexed = Dedup.containmentFromIndex(Dedup.pairIndex(docs))
      .orderBy("id1", "id2").collect().map(_.toString)
    assert(inline.sameElements(indexed))
    assert(inline.nonEmpty, "gate corpus must exercise the miner")
  }

  test("containment clusters weld the doc-in-doc family a jaccard clustering leaves apart; inline == indexed") {
    import spark.implicits._
    val docs4 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "iota kappa lambda mu"),
      (4L, "alpha beta nu xi")).toDF("doc_id", "text")
    val cc = Dedup.containmentClusters(docs4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L),
      s"containment must weld {1,2}: $cc")
    val jc = Dedup.dedupClusters(docs4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(jc == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L),
      s"jaccard at 0.8 must leave all four singletons: $jc")
    val inline = Dedup.containmentClusters(docs).orderBy("doc_id")
      .collect().map(_.toString)
    val indexed = Dedup.containmentClustersFromIndex(docs, Dedup.pairIndex(docs))
      .orderBy("doc_id").collect().map(_.toString)
    assert(inline.sameElements(indexed))
  }

  test("containment incremental == full containment restricted to batch-touching pairs") {
    val mod = Dedup.IncrementalBatchMod
    val full = Dedup.containmentQ(docs).collect()
      .filter(r => r.getLong(0) % mod == 0 || r.getLong(1) % mod == 0)
      .map(_.toString)
    val inc = Dedup.containmentIncrementalQ(docs).collect().map(_.toString)
    assert(inc.sameElements(full),
      s"incremental ${inc.length} vs full-restricted ${full.length}")
  }

  test("dedup clusters: chained near-dups collapse into one component") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps on running far"
    val d = Seq(
      (1L, base + " today"),
      (2L, base + " tonight"),  // pairs with 1
      (3L, base + " tonight!"), // pairs with 2 (and 1) — chain
      (4L, "an entirely different document about shuffle plans and columns here")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupClusters(d, threshold = 0.5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L, s"chain not collapsed: $out")
    assert(out(4L) == 4L)
  }

  test("pointer jumping: a 64-deep chain converges in O(log d) rounds") {
    import spark.implicits._
    // path graph 0-1-2-…-63: plain min-label propagation needs 63 rounds
    // (would blow the maxIters=10 budget); with pointer jumping the label
    // chain halves every round, so ~log2(64)+slack rounds suffice
    val n = 64
    val vertices = (0L until n.toLong).toDF("doc_id")
    val fwd = (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("id1", "id2")
    val edges = fwd.unionAll(fwd.select(col("id2").as("id1"), col("id1").as("id2")))
    val (labels, rounds) = Dedup.propagateMinLabels(vertices, edges, maxIters = 10)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.forall(_ == 0L), s"chain not collapsed to 0: ${out.take(5)}")
    assert(rounds <= 9, s"pointer jumping took $rounds rounds for diameter $n")
  }

  test("knn brute: k neighbors per query, self excluded, ranks ordered by cos") {
    val out = Similarity.knnCosineBrute(emb, k = 3).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 3)
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      val cs = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("knn query set is broadcast (no corpus x corpus product)") {
    val plan = Similarity.knnCosineBrute(emb).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"no broadcast in plan:\n$plan")
  }

  test("embedding_dedup pairs are symmetric-free and above threshold") {
    val rows = Similarity.embeddingDedup(emb, threshold = 0.3).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("id1") < r.getAs[Long]("id2"))
      assert(r.getAs[Double]("cos") >= 0.3)
    }
  }

  test("sessionize: sessions partition each user's events, durations within gaps") {
    val sess = Sessionize.sessionize(events)
    val nEvents = sess.agg(sum("n_events")).collect().head.getLong(0)
    assert(nEvents == events.count())
    // session bounds are ordered
    val bad = sess.filter(col("session_end_us") < col("session_start_us")).count()
    assert(bad == 0)
    // consecutive sessions of a user do not overlap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_seq")
    val overlap = sess
      .withColumn("prev_end", lag("session_end_us", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("session_start_us") - col("prev_end") <= Sessionize.GapUs)
      .count()
    assert(overlap == 0)
  }

  test("asof join: matched purchase is the latest at-or-before the click") {
    import spark.implicits._
    val ev = Seq(
      // user 1: purchases at t=100, 300; clicks at 200, 400, 50
      (1L, 1L, "purchase", 100L, 10.0), (1L, 2L, "click", 200L, 1.0),
      (1L, 3L, "purchase", 300L, 20.0), (1L, 4L, "click", 400L, 2.0),
      (1L, 5L, "click", 50L, 3.0)
    ).map { case (u, e, t, us, v) => (u, e, t, new java.sql.Timestamp(us), v) }
      .toDF("user_id", "event_id", "event_type", "ts", "value")
    val out = Sessionize.asofJoin(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("last_purchase_us")).map(_.toLong)).toMap
    assert(out(2L).contains(100000L)) // ms->us
    assert(out(4L).contains(300000L))
    assert(out(5L).isEmpty) // click before any purchase
  }

  test("embedding incremental admission agrees with the exact pair set on cross-split pairs") {
    val emb = Tables.embeddings(spark, sf)
    val mod = graft.operators.Dedup.IncrementalBatchMod
    // ground truth: the full exact threshold pairs, restricted to batch×corpus
    val pairs = graft.operators.Similarity.embeddingDedup(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val perBatch = (pairs.flatMap { case (a, b, c) =>
      Seq((a, b, c), (b, a, c))
    }).filter { case (b, cid, _) => b % mod == 0 && cid % mod != 0 }
      .groupBy(_._1)
    val got = graft.operators.Similarity.embeddingDedupIncremental(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3), r.getBoolean(4))).toMap
    val batchIds = emb.select("vec_id").collect().map(_.getLong(0)).filter(_ % mod == 0)
    assert(got.keySet == batchIds.toSet, "one verdict per batch vector")
    batchIds.foreach { id =>
      val (nm, dupOf, bestCos, isNew) = got(id)
      perBatch.get(id) match {
        case None =>
          assert(nm == 0 && dupOf == -1L && isNew, s"vec $id must be new")
        case Some(ms) =>
          assert(nm == ms.length && dupOf == ms.map(_._2).min && !isNew, s"vec $id")
          assert(math.abs(bestCos - ms.map(_._3).max) < 1e-12, s"vec $id best_cos")
      }
    }
    assert(batchIds.exists(id => got(id)._4) , "corpus should have new batch vectors")
  }

  test("embedding clusters are the transitive closure of the exact pair set") {
    // cross-derive: union-find over embeddingDedup's pairs with min-root
    // linking gives every vector's component-min label; embeddingClusters
    // must reproduce it exactly (same convention as dedup_cluster)
    val emb2 = Tables.embeddings(spark, sf)
    val ids = emb2.select("vec_id").collect().map(_.getLong(0))
    val pairs = graft.operators.Similarity.embeddingDedup(emb2)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap
    val got = graft.operators.Similarity.embeddingClusters(emb2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == ids.length, "one label per vector")
    got.foreach { case (v, c, canon) =>
      assert(c == expected(v), s"vec $v cluster mismatch: $c vs ${expected(v)}")
      assert(canon == (v == c), s"vec $v is_canonical mismatch")
    }
    // only interesting if the gate corpus has a real multi-member cluster
    assert(got.exists { case (v, c, _) => v != c },
      "gate corpus yields no multi-member semantic cluster")
  }
}
