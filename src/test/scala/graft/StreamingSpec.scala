package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Sessionize}
import graft.streaming.StreamingJobs

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Copies the real events parquet into a fresh dir (a streaming file
    * source needs a directory it can list). */
  private def stageEventsDir(tag: String): String = {
    val dir = Files.createTempDirectory(s"graft-stream-$tag")
    val src = Paths.get(s"$sf/events.parquet")
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming window agg matches the batch twin up to the watermark") {
    val dir = stageEventsDir("win")
    val q = StreamingJobs.windowAggStream(spark, dir)
      .writeStream.format("memory").queryName("win_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_stream")
      .select("window_start", "event_type", "n", "sum_value").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    // append mode emits windows closed by the final watermark = max ts - 2 h
    val events = Tables.events(spark, sf)
    val maxTs = events.agg(max("ts")).collect().head.getTimestamp(0)
    val horizonUs = maxTs.getTime * 1000 - 2L * 3600 * 1000000
    val expected = Relational.streamingWindowAgg(events)
      .filter(unix_micros(col("window_start")) + 3600L * 1000000 <= horizonUs)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed.nonEmpty)
    assert(streamed == expected,
      s"stream=${streamed.size} batch=${expected.size} missing=${(expected -- streamed).take(3)} extra=${(streamed -- expected).take(3)}")
  }

  test("streaming exact dedup passes one doc per batch fingerprint") {
    val dir = Files.createTempDirectory("graft-stream-dedup")
    Files.copy(java.nio.file.Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingJobs.dedupExactStream(spark, dir.toString)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("dedup_stream").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batchFps = graft.operators.TextOps.docFingerprint(Tables.documents(spark, sf))
      .select("fingerprint").distinct().collect().map(_.getString(0)).toSet

    // exactly one survivor per distinct fingerprint, and the survivor's
    // fingerprint is genuine (comes from the batch set)
    assert(streamed.length == batchFps.size,
      s"stream kept ${streamed.length}, batch has ${batchFps.size} distinct fingerprints")
    assert(streamed.map(_._2).toSet == batchFps)
  }

  test("stream-static incremental admission matches the batch operator row-for-row") {
    // the streaming twin is append-mode STATELESS (per-row signatures +
    // 8 stream-static index probes + higher-order verify) and its
    // contract is exactly the batch one — arriving docs never pair with
    // each other, the corpus is fixed — so parity is full row equality,
    // not modulo ordering
    val dir = Files.createTempDirectory("graft-stream-incr")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingJobs.incrementalAdmissionStream(spark, dir.toString)
      .writeStream.format("memory").queryName("incr_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2))
    val streamed = spark.table("incr_stream").collect().map(key).sortBy(_._1)
    val batch = graft.operators.Dedup.dedupIncremental(Tables.documents(spark, sf))
      .collect().map(key).sortBy(_._1)
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream=${streamed.length} batch=${batch.length} " +
        s"diff=${streamed.zip(batch).filter(p => p._1 != p._2).take(3).mkString(",")}")
    assert(streamed.exists(_._2) && streamed.exists(!_._2),
      "corpus exercises only one admission branch")
  }

  test("stream-static decontamination matches the batch operator row-for-row") {
    // append-mode stateless: per-row gram sets + one static bench-set row
    // joined on a constant key + per-row intersect — verdict final at
    // arrival, so parity with the batch probe-join is full row equality
    val dir = Files.createTempDirectory("graft-stream-contam")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingJobs.contaminationStream(spark, dir.toString)
      .writeStream.format("memory").queryName("contam_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
    val streamed = spark.table("contam_stream")
      .select("doc_id", "n_grams", "n_hit", "overlap_ratio", "contaminated")
      .collect().map(key).sortBy(_._1)
    val batch = graft.operators.Curation.contaminationCheck(Tables.documents(spark, sf))
      .select("doc_id", "n_grams", "n_hit", "overlap_ratio", "contaminated")
      .collect().map(key).sortBy(_._1)
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream=${streamed.length} batch=${batch.length} " +
        s"diff=${streamed.zip(batch).filter(p => p._1 != p._2).take(3).mkString(",")}")
    assert(streamed.exists(_._5) && streamed.exists(!_._5),
      "corpus exercises only one contamination verdict")
  }

  test("stream-static corpus diff matches the batch operator minus its removed rows") {
    // append-mode stateless: per-row fingerprint + one stream-static LEFT
    // join on doc_id — verdict final at arrival. `removed` is structurally
    // undetectable in a stream (no arriving row), so the contract is the
    // batch diff with status <> 'removed', row-for-row
    val dir = Files.createTempDirectory("graft-stream-diff")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingJobs.corpusDiffStream(spark, dir.toString)
      .writeStream.format("memory").queryName("diff_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) "" else r.getString(2),
        if (r.isNullAt(3)) "" else r.getString(3), r.getString(4))
    val streamed = spark.table("diff_stream").collect().map(key).sortBy(_._1)
    val batch = graft.operators.CorpusDiff
      .corpusDiffQ(Tables.documents(spark, sf))
      .filter(org.apache.spark.sql.functions.col("status") =!= "removed")
      .collect().map(key).sortBy(_._1)
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream=${streamed.length} batch=${batch.length} " +
        s"diff=${streamed.zip(batch).filter(p => p._1 != p._2).take(3).mkString(",")}")
    assert(Set("added", "changed", "unchanged").subsetOf(streamed.map(_._2).toSet),
      "corpus must exercise all stream-detectable statuses")
  }

  test("stream-static LM scoring matches the batch incremental operator row-for-row") {
    // append-mode stateless: the model rides as one static row (two maps +
    // vocab size), the doc score is a per-row aggregate fold over its pair
    // array — verdict final at arrival, same integer ppm algebra, so
    // parity with lmScoreIncremental is full row equality
    val dir = Files.createTempDirectory("graft-stream-lm")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingJobs.lmScoreStream(spark, dir.toString)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val streamed = spark.table("lm_stream")
      .select("doc_id", "n_bigrams", "sum_w", "lm_ppm")
      .collect().map(key).sortBy(_._1)
    val batch = graft.operators.LmScore.lmScoreIncremental(Tables.documents(spark, sf))
      .select("doc_id", "n_bigrams", "sum_w", "lm_ppm")
      .collect().map(key).sortBy(_._1)
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream=${streamed.length} batch=${batch.length} " +
        s"diff=${streamed.zip(batch).filter(p => p._1 != p._2).take(3).mkString(",")}")
    assert(streamed.exists(_._3 > 0), "no scored bigram in the stream twin")
  }

  test("stream-static paragraph admission matches the batch operator row-for-row") {
    // append-mode stateless: per-row window fingerprints + one static
    // corpus-index row on a constant key + per-row instance filter-count —
    // verdict final at arrival, batch contract (arriving docs never count
    // against each other), so parity is full row equality
    val dir = Files.createTempDirectory("graft-stream-para")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingJobs.paragraphAdmissionStream(spark, dir.toString)
      .writeStream.format("memory").queryName("para_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
    val streamed = spark.table("para_stream")
      .select("doc_id", "n_paras", "n_hit", "hit_frac", "is_new")
      .collect().map(key).sortBy(_._1)
    val batch = graft.operators.ParagraphDedup.paragraphIncremental(Tables.documents(spark, sf))
      .select("doc_id", "n_paras", "n_hit", "hit_frac", "is_new")
      .collect().map(key).sortBy(_._1)
    assert(streamed.length == batch.length && streamed.sameElements(batch),
      s"stream=${streamed.length} batch=${batch.length} " +
        s"diff=${streamed.zip(batch).filter(p => p._1 != p._2).take(3).mkString(",")}")
    assert(streamed.exists(_._5) && streamed.exists(!_._5),
      "corpus exercises only one admission branch")
  }

  test("stream-static substring admission matches the batch operator row-for-row") {
    // round 12: per-row gram hashes + one static corpus gram-set row +
    // the per-row aggregate-fold islands merge (no window, no state) —
    // span rows identical to substringIncremental's
    val dir = Files.createTempDirectory("graft-stream-substr")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingJobs.substringAdmissionStream(spark, dir.toString)
      .writeStream.format("memory").queryName("substr_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "span_start", "span_end", "n_grams", "start_token", "end_token")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    val streamed = rows(spark.table("substr_stream"))
    val batch = rows(graft.operators.SubstringDedup
      .substringIncremental(Tables.documents(spark, sf)))
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      s"stream=${streamed.length} batch=${batch.length} " +
        s"diff=${streamed.zip(batch).filter(p => p._1 != p._2).take(3).mkString(",")}")
  }

  test("streaming as-of join matches the batch LOCF window row-for-row") {
    val dir = stageEventsDir("asof")
    val q = StreamingJobs.asofJoinStream(spark, dir)
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getAs[java.lang.Double](3),
        r.getAs[java.lang.Long](4), r.getAs[java.lang.Double](5))).toSet
    val streamed = canon(spark.table("asof_stream")
      .select("user_id", "event_id", "t_us", "value",
        "last_purchase_us", "last_purchase_value").collect())
    // every click is emitted (unlike sessionize, no open tail): full equality
    val expected = canon(Sessionize.asofJoin(Tables.events(spark, sf))
      .select("user_id", "event_id", "t_us", "value",
        "last_purchase_us", "last_purchase_value").collect())
    assert(streamed.nonEmpty)
    assert(streamed == expected,
      s"stream=${streamed.size} batch=${expected.size} missing=${(expected -- streamed).take(3)} extra=${(streamed -- expected).take(3)}")
  }

  test("asofFn: NULL-valued purchase advances time but not the last non-null value") {
    // mirrors the batch twin's two independent ignoreNulls LOCF windows;
    // the parity spec above can't see this (the fixture has no NULL
    // purchase values), so pin it directly on the fold
    import StreamingJobs.{AsofEvent, PurchaseState}
    import org.apache.spark.sql.streaming.TestGroupState
    val st = TestGroupState.create[PurchaseState](
      org.apache.spark.api.java.Optional.empty[PurchaseState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[java.lang.Long]()
        .asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)
    val batch1 = Iterator(
      AsofEvent(7L, 1L, 1L, Some(5.0), side = 0),   // P1 value 5.0
      AsofEvent(7L, 2L, 2L, None, side = 0),        // P2 NULL value
      AsofEvent(7L, 3L, 3L, Some(1.0), side = 1))   // click
    val out1 = StreamingJobs.asofFn(7L, batch1, st).toArray
    assert(out1.length == 1)
    assert(out1(0).last_purchase_us == Some(2L), "time must advance to the NULL purchase")
    assert(out1(0).last_purchase_value == Some(5.0), "value must keep the last NON-NULL")
    // cross-batch: the merged state must carry the same pair forward
    val out2 = StreamingJobs.asofFn(7L,
      Iterator(AsofEvent(7L, 4L, 4L, Some(2.0), side = 1)), st).toArray
    assert(out2(0).last_purchase_us == Some(2L) && out2(0).last_purchase_value == Some(5.0))
  }

  // ---------------------------------------------------------------------
  // Cross-batch OUT-OF-ORDER contract (round-4 verdict observation #1):
  // parity with the batch twins is exact when arrival respects event-time
  // order batch-to-batch; these specs pin what happens when it doesn't.
  // ---------------------------------------------------------------------

  private def freshAsofState() = {
    import StreamingJobs.PurchaseState
    org.apache.spark.sql.streaming.TestGroupState.create[PurchaseState](
      org.apache.spark.api.java.Optional.empty[PurchaseState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[java.lang.Long]()
        .asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)
  }

  test("asofFn: a LATE purchase never rewinds state — future clicks stay batch-correct") {
    import StreamingJobs.AsofEvent
    val st = freshAsofState()
    // batch 1, in order: purchase@10 v=5, click@20 → matches (10, 5.0)
    val out1 = StreamingJobs.asofFn(7L, Iterator(
      AsofEvent(7L, 1L, 10L, Some(5.0), side = 0),
      AsofEvent(7L, 2L, 20L, Some(1.0), side = 1)), st).toArray
    assert(out1.map(m => (m.last_purchase_us, m.last_purchase_value)).toSeq ==
      Seq((Some(10L), Some(5.0))))
    // batch 2 violates event-time order: purchase@5 arrives after the
    // purchase@10 is already in state. State must NOT rewind: the click@30
    // still matches the true latest purchase (10, 5.0), not (5, 9.0).
    val out2 = StreamingJobs.asofFn(7L, Iterator(
      AsofEvent(7L, 3L, 5L, Some(9.0), side = 0),
      AsofEvent(7L, 4L, 30L, Some(2.0), side = 1)), st).toArray
    assert(out2.map(m => (m.last_purchase_us, m.last_purchase_value)).toSeq ==
      Seq((Some(10L), Some(5.0))),
      "late older purchase must update neither LOCF field")
    // batch 3: a late purchase NEWER than state (t=15 > 10, but older than
    // the already-emitted click@20). Future clicks adopt it — exact batch
    // semantics for everything still unemitted; the already-emitted
    // click@20 keeps (10, 5.0), the documented no-retraction divergence
    // (a batch re-run would give it (15, 9.5)).
    val out3 = StreamingJobs.asofFn(7L, Iterator(
      AsofEvent(7L, 5L, 15L, Some(9.5), side = 0),
      AsofEvent(7L, 6L, 40L, Some(3.0), side = 1)), st).toArray
    assert(out3.map(m => (m.last_purchase_us, m.last_purchase_value)).toSeq ==
      Seq((Some(15L), Some(9.5))))
  }

  test("sessionizeFn: late events absorb monotonically; older-than-open-session merges (documented divergence)") {
    import StreamingJobs.{SessEvent, SessState}
    val st = org.apache.spark.sql.streaming.TestGroupState.create[SessState](
      org.apache.spark.api.java.Optional.empty[SessState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout,
      0L, org.apache.spark.api.java.Optional.empty[java.lang.Long]()
        .asInstanceOf[org.apache.spark.api.java.Optional[Long]],
      hasTimedOut = false)
    val gapUs = 1000L
    // batch 1: open session [100, 200]
    assert(StreamingJobs.sessionizeFn(gapUs)(7L, Iterator(
      SessEvent(7L, 100L, Some(100L)), SessEvent(7L, 200L, Some(200L))), st).isEmpty)
    // batch 2: t=5 is older than the open session AND outside the gap
    // before its start — a batch re-run would make it its own session;
    // the stream merges it into the open one with a monotone span
    // (start=min=5). Then t=5000 exceeds the gap and closes the session.
    val closed = StreamingJobs.sessionizeFn(gapUs)(7L, Iterator(
      SessEvent(7L, 5000L, Some(100L)), SessEvent(7L, 5L, Some(400L))), st).toArray
    assert(closed.map(s => (s.session_start_us, s.session_end_us, s.n_events, s.sum_value))
      .toSeq == Seq((5L, 200L, 3L, Some(7.0))),
      "late event must fold in with min/max span, never rewind session_end")
  }

  test("asof stream two-batch out-of-order run: no retraction, future rows batch-correct") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val src = Files.createTempDirectory("graft-asof-ooo-src").toString
    val out = Files.createTempDirectory("graft-asof-ooo-out").toString
    val ckpt = Files.createTempDirectory("graft-asof-ooo-ckpt").toString
    def writeBatch(rows: Seq[(Long, Long, Long, String, java.lang.Double)]): Unit = {
      val rdd = spark.sparkContext.parallelize(rows.map { case (id, tUs, u, typ, v) =>
        Row(id, tUs * 1000L, u, typ, v: java.lang.Double, """{}""")
      }, 1)
      spark.createDataFrame(rdd, StreamingJobs.eventsRawSchema(tsIsLong = true))
        .write.mode("append").parquet(src)
    }
    def runOnce(): Unit = {
      val q = StreamingJobs.asofJoinStream(spark, src)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // batch 1 (in order): purchase@10 v=5, click@20
    writeBatch(Seq((1L, 10L, 1L, "purchase", 5.0), (2L, 20L, 1L, "click", 1.0)))
    runOnce()
    // batch 2 (late): purchase@15 v=9 arrives AFTER click@20 was emitted
    writeBatch(Seq((3L, 15L, 1L, "purchase", 9.0), (4L, 30L, 1L, "click", 2.0)))
    runOnce()
    val got = spark.read.parquet(out)
      .select("event_id", "last_purchase_us", "last_purchase_value").collect()
      .map(r => (r.getLong(0), r.getAs[java.lang.Long](1), r.getAs[java.lang.Double](2)))
      .toSet
    // click@20 keeps its batch-1 match (10, 5.0) — append mode is final,
    // the documented divergence (a batch re-run would say (15, 9.0));
    // click@30 sees the late purchase — batch-correct for unemitted rows
    assert(got == Set((2L, 10L: java.lang.Long, 5.0: java.lang.Double),
                      (4L, 15L: java.lang.Long, 9.0: java.lang.Double)), got.toString)
  }

  test("stream-static refresh contract: index is captured per RUN, emitted verdicts final") {
    // round 7 (verdict #5): what happens when the static corpus index is
    // REBUILT between batches. Contract pinned here and in the scaladoc:
    // the static side's snapshot is captured at query (re)start — a
    // scheduled AvailableNow run per ingest batch picks up the refreshed
    // index naturally — and already-emitted verdicts are FINAL (append
    // mode): a batch-1 doc judged against the batch-1 index is never
    // re-judged, even if the refreshed index would now flag it.
    import org.apache.spark.sql.Row
    val src = Files.createTempDirectory("graft-incr-refresh-src").toString
    val out = Files.createTempDirectory("graft-incr-refresh-out").toString
    val ckpt = Files.createTempDirectory("graft-incr-refresh-ckpt").toString
    def writeDocs(rows: Seq[(Long, String)]): Unit = {
      val rdd = spark.sparkContext.parallelize(rows.map { case (id, text) =>
        Row(id, text, "en", "s", text.length.toLong)
      }, 1)
      spark.createDataFrame(rdd, StreamingJobs.documentsRawSchema)
        .write.mode("append").parquet(src)
    }
    def runOnce(): Unit = {
      // re-invoking the builder re-reads the static corpus — this IS the
      // index refresh; the checkpoint makes the source skip processed files
      val q = StreamingJobs.incrementalAdmissionStream(spark, src)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    def sinkRows() = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten"
    val t3 = "red orange yellow green blue indigo violet black white gray"
    // run 1: corpus doc 1; batch docs 5 (dup of 1), 10 (unique), and 15 —
    // whose only partner (future corpus doc 21) does not exist yet
    writeDocs(Seq((1L, t1), (5L, t1), (10L, t2), (15L, t3)))
    runOnce()
    val after1 = sinkRows()
    assert(after1 == Set((5L, false, 1L), (10L, true, -1L), (15L, true, -1L)),
      s"run-1 verdicts must come from the run-1 index: $after1")
    // index rebuild between runs: corpus doc 21 (t3) lands together with
    // batch doc 20 (t3)
    writeDocs(Seq((21L, t3), (20L, t3)))
    runOnce()
    val after2 = sinkRows()
    // doc 20 is judged against the REFRESHED index (dup of 21); doc 15's
    // stale run-1 verdict stands — no retraction, no re-emission
    assert(after2 == after1 + ((20L, false, 21L)),
      s"run-2 must add exactly the refreshed-index verdict for doc 20: $after2")
  }

  test("stateful streaming sessionize emits exactly the batch-closed sessions") {
    val dir = stageEventsDir("sess")
    val q = StreamingJobs.sessionizeStream(spark, dir)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // sum_value compared as java.lang.Double so an all-NULL-value session's
    // NULL rides the tuple (batch/stream must agree on it, not coerce to 0)
    val streamed = spark.table("sess_stream")
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[java.lang.Double](4))).toSet

    // one batch covers all data, so the stream closes every session except
    // each user's final (still-open) one
    val batch = Sessionize.sessionize(Tables.events(spark, sf))
    val lastSeq = batch.groupBy("user_id").agg(max("session_seq").as("mx"))
    val expected = batch.join(lastSeq, Seq("user_id"))
      .filter(col("session_seq") =!= col("mx"))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[java.lang.Double](4))).toSet

    assert(streamed == expected,
      s"stream=${streamed.size} batch-closed=${expected.size}")
  }

  test("stream-static CDC apply verdicts every arriving change like the batch merge") {
    // append-mode stateless: one stream-static LEFT join on the key.
    // Contract: one verdict per ARRIVING change — upserts match the batch
    // cdcApply status row-for-row; deletes (dropped from the batch MERGE
    // output) are observable here because the delete row itself arrives;
    // 'kept' rows have no arriving change and are structurally absent.
    val dir = Files.createTempDirectory("graft-stream-cdc")
    Files.copy(Paths.get(s"$sf/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = StreamingJobs.cdcApplyStream(spark, dir.toString)
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("cdc_stream")
      .select("doc_id", "status",
        "new_fp").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) "" else r.getString(2))).sortBy(_._1)
    val docs = Tables.documents(spark, sf)
    val upserts = graft.operators.Cdc.cdcApplyQ(docs)
      .filter(col("status") =!= "kept")
      .select("doc_id", "status", "fp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val deletes = graft.operators.Cdc.changeBatch(docs)
      .filter(col("op") === "delete")
      .select("doc_id").collect()
      .map(r => (r.getLong(0), "deleted", ""))
    val expected = (upserts ++ deletes).sortBy(_._1)
    assert(streamed.length == expected.length && streamed.sameElements(expected),
      s"stream=${streamed.length} batch=${expected.length} " +
        s"diff=${streamed.zip(expected).filter(p => p._1 != p._2).take(3).mkString(",")}")
    assert(Set("inserted", "updated", "deleted") == streamed.map(_._2).toSet,
      "corpus must exercise all three change verdicts")
  }

  test("stateful IVM stream: seeded view + chunked delta replay equals the batch operator") {
    // base view seeded via the INITIAL-STATE overload; the change feed
    // replays in 3 micro-batches (one chunk file per trigger) so deltas
    // ACCUMULATE across batches on live state — latest emission per
    // source must equal the batch incremental_view_maintain row set.
    val docs = Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("graft-stream-ivm").toString
    (0 to 2).foreach { c =>
      docs.filter(col("doc_id") % 3 === c).coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val q = StreamingJobs.ivmStream(spark, dir, filesPerTrigger = 1)
      .writeStream.format("memory").queryName("ivm_stream")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val emitted = spark.table("ivm_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(emitted.map(_._4).max >= 2, "replay did not span multiple micro-batches")
    val latest = emitted.groupBy(_._1).map { case (src, rows) =>
      val last = rows.maxBy(_._4)
      (src, last._2, last._3)
    }.filter(_._2 > 0).toSet
    // batch operator over the SAME 3-chunk table (identical row set)
    val batch = graft.operators.Ivm
      .incrementalViewMaintainQ(spark.read.parquet(dir)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(latest == batch,
      s"stream view ≠ batch: only-stream=${(latest -- batch).take(3)} " +
        s"only-batch=${(batch -- latest).take(3)}")
  }

  test("streaming attribution rollup matches the batch operator per channel") {
    // keyed state: one last-touch record per user; purchases emit final
    // attributed rows at arrival. The batch operator ships the channel
    // ROLLUP, so parity = grouping the emitted per-purchase rows
    // reproduces its (channel, n_conversions, value_cents) exactly
    val dir = stageEventsDir("attr")
    val q = StreamingJobs.attributionStream(spark, dir)
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("attr_stream").collect()
      .map(r => (r.getString(4), r.getLong(3)))
      .groupBy(_._1).map { case (ch, v) => (ch, v.size.toLong, v.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val batch = graft.operators.Attribution
      .attributionLastTouchQ(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch,
      s"stream=$streamed batch=$batch")
    assert(streamed.map(_._2).sum > 0, "no purchases attributed in the stream twin")
  }

  test("streaming event delivery dedup passes one event per content key") {
    val dir = stageEventsDir("evdedup")
    val q = StreamingJobs.eventDedupStream(spark, dir)
      .writeStream.format("memory").queryName("evdedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("evdedup_stream").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // batch twin: one logical event per content key, per type
    val batchLogical = graft.operators.EventDedup
      .eventDedupReportQ(Tables.events(spark, sf)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val streamByType = streamed.groupBy(_._2).map { case (t, ks) => t -> ks.length.toLong }
    assert(streamed.length == streamed.distinct.length, "stream emitted a key twice")
    assert(streamByType == batchLogical,
      s"stream=$streamByType batch=$batchLogical")
  }
}
