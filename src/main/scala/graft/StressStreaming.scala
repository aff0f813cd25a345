package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.LateArrival
import graft.streaming.StreamingJobs

/** Scratch measurement: the §D STREAMING twins at 10× gate volume — the
  * last family with no 10× battery ([[StressRelational]] covered the
  * classics, [[StressEvents]] the batch event family, StressCuration the
  * corpus operators). Each job replays an arrival-ordered corpus in
  * [[Chunks]] micro-batch chunks (the WatermarkSpec harness: append chunk
  * files, drain with AvailableNow on one checkpoint, repeat), at 1× and
  * at 10×, and reports what a wall clock can't see from batch mode:
  *
  *  - `exec_s`    Σ triggerExecution across every micro-batch (the pure
  *                processing wall, query-(re)start overhead excluded)
  *  - `state_rows` max state-store rows across batches (the blowup
  *                signal: flatMapGroups keeps ONE record per user;
  *                dropDuplicates one per distinct content key — so
  *                events-keyed state must grow ~10× with the user
  *                universe while dedup state tracks DISTINCT mass, which
  *                the replicated corpus keeps flat by construction)
  *  - `max_batch_s` slowest single micro-batch (a one-reducer batch
  *                shows here long before it shows in the total)
  *
  * 10× corpora: events replicate with user/event_id shifted by r·10⁶
  * (disjoint user universes, timestamps UNCHANGED — so arrival order by
  * ts interleaves the replicas: every chunk carries 10× the traffic of
  * the same time slice, the honest scale-up shape for a stream);
  * documents replicate doc_id·10+r with texts unchanged (StressCuration's
  * corpus — volume 10×, distinct content 1×). Stream-static twins
  * (cdc_apply) re-list their static side at each chunk's query start,
  * per the documented refresh contract. */
object StressStreaming {

  private val Off = 1000000L
  private val Reps = 10
  private val Chunks = 6

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_stream10x"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- pre-materialize arrival-ordered chunks at both scales --------
    def writeChunks(df: DataFrame, orderCols: Seq[String], root: String): Unit = {
      if (new java.io.File(s"$root/c0/_SUCCESS").exists()) return
      val w = Window.orderBy(orderCols.map(col): _*)
      val chunked = df.withColumn("c", ntile(Chunks).over(w)).localCheckpoint()
      (1 to Chunks).foreach { k =>
        chunked.filter(col("c") === k).drop("c")
          .repartition(4).write.mode("overwrite").parquet(s"$root/c${k - 1}")
      }
    }
    val ev1 = Tables.events(spark, baseDir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val ev10 = ev1.withColumn("r", explode(expr(s"sequence(0, ${Reps - 1})")))
      .select((col("event_id") + col("r") * Off).as("event_id"), col("ts"),
        (col("user_id") + col("r") * Off).as("user_id"),
        col("event_type"), col("value"), col("props"))
    val doc1 = spark.read.parquet(s"$baseDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val doc10 = doc1.withColumn("r", explode(expr(s"sequence(0, ${Reps - 1})")))
      .select((col("doc_id") * 10 + col("r")).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    writeChunks(ev1, Seq("ts", "event_id"), s"$workDir/ev1")
    writeChunks(ev10, Seq("ts", "event_id"), s"$workDir/ev10")
    writeChunks(doc1, Seq("doc_id"), s"$workDir/doc1")
    writeChunks(doc10, Seq("doc_id"), s"$workDir/doc10")

    val wmDelay = {
      val us = LateArrival.globalLateness(Tables.events(spark, baseDir))
        .agg(max("max_behind_us")).collect()(0).getLong(0)
      s"${us / 1000000 + 1} seconds"
    }

    val cusumMu: Map[String, Long] =
      graft.operators.Cusum.cusumAlarm(Tables.events(spark, baseDir))
        .select("event_type", "mu_milli").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    // ---- the battery ---------------------------------------------------
    // each entry: name, chunk root pair (1x, 10x), job constructor
    val jobs: Seq[(String, (String, String), (SparkSession, String) => DataFrame)] = Seq(
      ("window_agg", ("ev1", "ev10"),
        (s, d) => StreamingJobs.windowAggStream(s, d)),
      ("event_dedup", ("ev1", "ev10"),
        (s, d) => StreamingJobs.eventDedupStream(s, d)),
      ("sessionize", ("ev1", "ev10"),
        (s, d) => StreamingJobs.sessionizeStream(s, d).toDF),
      ("sessionize_wm", ("ev1", "ev10"),
        (s, d) => StreamingJobs.sessionizeStreamWm(s, d, wmDelay).toDF),
      ("asof_join", ("ev1", "ev10"),
        (s, d) => StreamingJobs.asofJoinStream(s, d).toDF),
      ("attribution", ("ev1", "ev10"),
        (s, d) => StreamingJobs.attributionStream(s, d).toDF),
      ("dedup_exact", ("doc1", "doc10"),
        (s, d) => StreamingJobs.dedupExactStream(s, d)),
      ("cdc_apply", ("doc1", "doc10"),
        (s, d) => StreamingJobs.cdcApplyStream(s, d)),
      // round-10 addition: the stream-stream range join — two unbounded
      // sides, per-side join state; the range condition is what keeps
      // state bounded, and the 10× replicas multiply BOTH sides
      ("ss_join", ("ev1", "ev10"),
        (s, d) => StreamingJobs.clickPurchaseJoinStream(s, d, wmDelay)),
      // round-12 addition: the LEFT-OUTER twin — same per-side join
      // state plus the unmatched-purchase rows the engine must RETAIN
      // until the watermark passes them (the NULL-emission contract);
      // state should track the inner twin's, not blow past it
      ("ss_outer", ("ev1", "ev10"),
        (s, d) => StreamingJobs.clickPurchaseOuterJoinStream(s, d, wmDelay)),
      // round-14 addition: the streaming CUSUM — state is ONE record per
      // type (catalog-bounded) with open-day counts bounded by the delay
      // window; μ is derived once from the 1× batch operator (the
      // stream-static contract; at 10× the counts outrun the 1× baseline
      // and S just grows — the battery measures exec/state, parity is
      // CusumStreamSpec's job)
      ("cusum", ("ev1", "ev10"),
        (s, d) => StreamingJobs.cusumStream(s, d, wmDelay, cusumMu).toDF))

    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None

    case class Run(execS: Double, stateRows: Long, maxBatchS: Double, batches: Int)

    def replay(name: String, chunkRoot: String,
               mk: (SparkSession, String) => DataFrame): Run = {
      val src = Files.createTempDirectory(s"graft-ss-src-$name").toString
      val out = Files.createTempDirectory(s"graft-ss-out-$name").toString
      val ckpt = Files.createTempDirectory(s"graft-ss-ck-$name").toString
      var execMs = 0L; var state = 0L; var maxBatchMs = 0L; var batches = 0
      (0 until Chunks).foreach { k =>
        spark.read.parquet(s"$workDir/$chunkRoot/c$k")
          .write.mode("append").parquet(src)
        val q = mk(spark, src)
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(600000)
        q.recentProgress.foreach { p =>
          val ms = Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue()).getOrElse(0L)
          if (p.numInputRows > 0 || ms > maxBatchMs) {
            execMs += ms; maxBatchMs = math.max(maxBatchMs, ms); batches += 1
          }
          state = math.max(state, p.stateOperators.map(_.numRowsTotal).sum)
        }
      }
      Run(execMs / 1e3, state, maxBatchMs / 1e3, batches)
    }

    jobs.foreach { case (name, (r1, r10), mk) =>
      if (only.exists(fs => !fs.exists(name.contains))) ()
      else {
      val a = replay(name, r1, mk)
      val b = replay(name, r10, mk)
      println(f"STREAM job=$name chunks=$Chunks " +
        f"exec1=${a.execS}%.2f exec10=${b.execS}%.2f factor=${b.execS / math.max(a.execS, 0.01)}%.1f " +
        f"state1=${a.stateRows} state10=${b.stateRows} " +
        f"maxbatch1=${a.maxBatchS}%.2f maxbatch10=${b.maxBatchS}%.2f")
      }
    }

    // round-15 addition: the label-maintenance twin (clusterMaintainBatch)
    // — its state is TWO CommitLog tables, not a Spark state store, so it
    // gets its own replay: per-chunk wall measured directly; "state" = the
    // label CATALOG (one (doc_id, cluster_id) row per arrived doc — never
    // pair state, never text; bytes reported to make the slimness
    // measurable). Work per chunk is the batch-touching delta mine + the
    // catalog-sized label CC — the pair_index_delta economics in stream
    // clothes.
    if (!only.exists(fs => !fs.exists("cluster_maintain".contains))) {
      def replayCluster(chunkRoot: String): (Double, Double, Long, Long, Seq[Double]) = {
        val src = Files.createTempDirectory("graft-ss-cm-src").toString
        val docsT = Files.createTempDirectory("graft-ss-cm-docs").resolve("t").toString
        val labelsT = Files.createTempDirectory("graft-ss-cm-lbl").resolve("t").toString
        val ckpt = Files.createTempDirectory("graft-ss-cm-ck").toString
        val schema = spark.read.parquet(s"$workDir/$chunkRoot/c0").schema
        var exec = 0.0; var maxB = 0.0
        val perChunk = Vector.newBuilder[Double]
        (0 until Chunks).foreach { k =>
          spark.read.parquet(s"$workDir/$chunkRoot/c$k")
            .write.mode("append").parquet(src)
          val t0 = System.nanoTime()
          val q = spark.readStream.schema(schema).parquet(src)
            .writeStream
            .foreachBatch(StreamingJobs.clusterMaintainBatch(docsT, labelsT, "stress_cm"))
            .option("checkpointLocation", ckpt)
            .trigger(Trigger.AvailableNow()).start()
          q.awaitTermination(600000)
          val dt = (System.nanoTime() - t0) / 1e9
          exec += dt; maxB = math.max(maxB, dt); perChunk += dt
        }
        val cat = graft.sources.CommitLog.read(spark, labelsT)
        val rows = cat.count()
        val bytes = graft.sources.CommitLog
          .liveFiles(labelsT, graft.sources.CommitLog.latestVersion(labelsT))
          .map(f => new java.io.File(labelsT, f).length()).sum
        (exec, maxB, rows, bytes, perChunk.result())
      }
      val (e1, m1, r1, b1, p1) = replayCluster("doc1")
      val (e10, m10, r10, b10, p10) = replayCluster("doc10")
      def walls(p: Seq[Double]): String = p.map(d => f"$d%.1f").mkString(",")
      println(f"STREAM job=cluster_maintain chunks=$Chunks " +
        f"exec1=$e1%.2f exec10=$e10%.2f factor=${e10 / math.max(e1, 0.01)}%.1f " +
        f"state1=$r1(${b1 / 1024}KiB) state10=$r10(${b10 / 1024}KiB) " +
        f"maxbatch1=$m1%.2f maxbatch10=$m10%.2f " +
        f"walls1=[${walls(p1)}] walls10=[${walls(p10)}]")

      // round 16 — the store-back claim measured on a DEDUPLICATED
      // stream: CONSTANT-size chunks of DISTINCT documents (disjoint
      // doc_id slices, content 1×), so batch-touching pair volume is
      // ~flat per chunk. The r15 form re-shingled the whole arrived
      // corpus per batch — its per-chunk wall GREW with arrival count
      // by construction; the gram-store form's per-chunk wall must
      // stop growing (the stored-integer scan is the only corpus term).
      val dedupChunks = 8
      def replayDedup(): Seq[Double] = {
        val docs = spark.read.parquet(s"$baseDir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint()
        val n = docs.count()
        val per = math.max(n / dedupChunks, 1L)
        val docsT = Files.createTempDirectory("graft-ss-cmd-docs").resolve("t").toString
        val labelsT = Files.createTempDirectory("graft-ss-cmd-lbl").resolve("t").toString
        val fn = StreamingJobs.clusterMaintainBatch(docsT, labelsT, "stress_cmd")
        val ids = docs.select("doc_id").orderBy("doc_id")
          .collect().map(_.getLong(0))
        (0 until dedupChunks).map { k =>
          val lo = ids((k * per).toInt.min(ids.length - 1))
          val hi = if (k == dedupChunks - 1) Long.MaxValue
            else ids(((k + 1) * per).toInt.min(ids.length - 1))
          val chunk = docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
            .repartition(32)
          val t0 = System.nanoTime()
          fn(chunk, k.toLong)
          (System.nanoTime() - t0) / 1e9
        }
      }
      val pd = replayDedup()
      println(f"STREAM job=cluster_maintain_dedup chunks=$dedupChunks " +
        f"walls=[${walls(pd)}] " +
        f"late_over_early=${pd.drop(dedupChunks / 2).sum / math.max(pd.take(dedupChunks / 2).sum, 0.01)}%.2f")

      // round 17 — the PRUNED PROBE census (the r16 residual weak
      // finding): with the gram index sh-CLUSTERED (compactClustered +
      // per-file sh stats), a small batch's corpus probe must touch only
      // the files whose sh range intersects the batch's band set — and
      // the touched census must track the BATCH (its band count), not
      // the index (which doubles between the two measurement points).
      // Three builds over the same deduplicated arrival: probe after
      // half the corpus, probe after all of it, and a full-scan twin
      // (maxProbeBands=0 disables the cut) for the wall A/B.
      def buildAndProbe(chunksIn: Int, maxBands: Int): (Double, Int, Int) = {
        val docs = spark.read.parquet(s"$baseDir/documents.parquet")
          .select(col("doc_id"), col("text")).localCheckpoint()
        val ids = docs.select("doc_id").orderBy("doc_id")
          .collect().map(_.getLong(0))
        val probeIds = ids.takeRight(2).toSet // tiny batch: 2 docs
        val arriving = docs.filter(!col("doc_id").isin(probeIds.toSeq: _*))
        val per = math.max((ids.length - 2) / dedupChunks, 1)
        val docsT = Files.createTempDirectory("graft-ss-cmp-docs").resolve("t").toString
        val labelsT = Files.createTempDirectory("graft-ss-cmp-lbl").resolve("t").toString
        val gramsT = s"${labelsT}_grams"
        val fn = StreamingJobs.clusterMaintainBatch(docsT, labelsT, "stress_cmp",
          compactGramsEvery = 2, gramsTargetFiles = 256,
          maxProbeBands = maxBands)
        (0 until chunksIn).foreach { k =>
          val lo = ids(k * per)
          val hi = if (k == chunksIn - 1 && chunksIn == dedupChunks) ids(ids.length - 2)
            else ids((k + 1) * per)
          fn(arriving.filter(col("doc_id") >= lo && col("doc_id") < hi)
            .repartition(32), k.toLong)
        }
        // census BEFORE the probe lands: the cut the maintainer will use
        import graft.sources.CommitLog
        val probeBatch = docs.filter(col("doc_id").isin(probeIds.toSeq: _*))
        val total = CommitLog.liveFiles(gramsT, CommitLog.latestVersion(gramsT)).size
        val kept = StreamingJobs.gramBandPredicate(
          graft.operators.Dedup.gramIndex(probeBatch)) match {
          case Some(c) => CommitLog.prunedLiveFiles(spark, gramsT, c).size
          case None => total
        }
        // the probe runs through a no-compaction twin of the same state
        // so its wall is the batch work alone (the arrival fn's cadence
        // would fold a full-index OPTIMIZE into the timed window)
        val probeFn = StreamingJobs.clusterMaintainBatch(docsT, labelsT,
          "stress_cmp", gramsTargetFiles = 256, maxProbeBands = maxBands)
        val t0 = System.nanoTime()
        probeFn(probeBatch.repartition(4), chunksIn.toLong)
        ((System.nanoTime() - t0) / 1e9, kept, total)
      }
      val (wHalf, kHalf, tHalf) = buildAndProbe(dedupChunks / 2, 512)
      val (wFull, kFull, tFull) = buildAndProbe(dedupChunks, 512)
      val (wScan, _, _) = buildAndProbe(dedupChunks, 0)
      println(f"STREAM job=cluster_maintain_probe " +
        f"kept_half=$kHalf/$tHalf kept_full=$kFull/$tFull " +
        f"probe_wall_half=$wHalf%.2f probe_wall_full=$wFull%.2f " +
        f"probe_wall_fullscan=$wScan%.2f")
    }
    spark.stop()
  }
}
