package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Dedup
import graft.sources.CommitLog

/** The §D LABEL-MAINTENANCE twin (round 15 — the r14 verdict's #4
  * order): documents arrive as a stream, each micro-batch merges into
  * the standing near-dup clustering through the exactly-once pipe, and
  * the maintained label catalog equals the from-scratch clustering at
  * every drain point — the IncrementalCcSpec weld fixture ARRIVING
  * ACROSS CHUNKS, so the merge that welds two old components happens in
  * a genuinely later micro-batch. Replay (fresh streaming checkpoint)
  * moves neither state table; the crash-between-commits window replays
  * into a consistent merge (the two-txn recovery path). */
class ClusterStreamSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // the IncrementalCcSpec weld: j(M,A) = j(M,B) = 18/22 = 0.818 ≥ 0.8,
  // j(A,B) = 16/24 = 0.667 < 0.8 — A and B cluster ONLY through M
  private val w = (0 to 20).map(i => s"w$i")
  private val mTxt = w.mkString(" ")
  private val aTxt = (w.take(19) ++ Seq("aa1", "aa2")).mkString(" ")
  private val bTxt = (Seq("bb1", "bb2") ++ w.drop(2)).mkString(" ")

  private val chunks: Seq[Seq[(Long, String)]] = Seq(
    Seq(1L -> aTxt, 3L -> "lone text here"),
    Seq(2L -> bTxt),           // A and B now both present — still separate
    Seq(5L -> mTxt))           // the weld arrives LAST

  private def labels(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("weld across micro-batches: maintained catalog == from-scratch at every drain") {
    val src = Files.createTempDirectory("graft_cs_src").toString
    val docsT = Files.createTempDirectory("graft_cs_docs").resolve("t").toString
    val labelsT = Files.createTempDirectory("graft_cs_lbl").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft_cs_ck").toString
    val schema = docsDf(chunks.head).schema
    var arrived = Seq.empty[(Long, String)]
    chunks.foreach { chunk =>
      docsDf(chunk).coalesce(1).write.mode("append").parquet(src)
      arrived ++= chunk
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream
        .foreachBatch(StreamingJobs.clusterMaintainBatch(docsT, labelsT, "cs_app"))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // drain point: the maintained catalog equals the from-scratch
      // clustering of everything that has arrived
      val maintained = labels(CommitLog.read(spark, labelsT))
      val fromScratch = labels(Dedup.dedupClusters(docsDf(arrived)))
      assert(maintained == fromScratch,
        s"after ${arrived.map(_._1)}: $maintained != $fromScratch")
    }
    // the weld actually happened across chunks: A(1), B(2), M(5) share
    // min-id label 1; the singleton kept its own
    val fin = labels(CommitLog.read(spark, labelsT))
    assert(fin(1L) == 1L && fin(2L) == 1L && fin(5L) == 1L, s"no weld: $fin")
    assert(fin(3L) == 3L)
    // full replay with a FRESH streaming checkpoint: batchIds restart,
    // all three tables' txn watermarks reject every re-delivery — no
    // table moves (docs, the round-16 gram index, the catalog)
    val gramsT = s"${labelsT}_grams"
    val docsV = CommitLog.latestVersion(docsT)
    val gramsV = CommitLog.latestVersion(gramsT)
    val lblV = CommitLog.latestVersion(labelsT)
    val q2 = spark.readStream.schema(schema).parquet(src)
      .writeStream
      .foreachBatch(StreamingJobs.clusterMaintainBatch(docsT, labelsT, "cs_app"))
      .option("checkpointLocation",
        Files.createTempDirectory("graft_cs_ck2").toString)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    assert(CommitLog.latestVersion(docsT) == docsV, "replay moved the docs table")
    assert(CommitLog.latestVersion(gramsT) == gramsV, "replay moved the gram index")
    assert(CommitLog.latestVersion(labelsT) == lblV, "replay moved the catalog")
    assert(labels(CommitLog.read(spark, labelsT)) == fin)
    // the persisted gram index holds exactly the arrived corpus's grams,
    // appended once per batch — each document was shingled ONCE, ever
    // (the round-16 store-back claim: per-batch text work is the batch)
    val stored = CommitLog.read(spark, gramsT)
      .select("doc_id", "sh", "nsh").collect().toSet
    val fresh = Dedup.gramIndex(docsDf(arrived))
      .select("doc_id", "sh", "nsh").collect().toSet
    assert(stored == fresh, "stored gram index != fresh shingling of the corpus")
    assert(gramsV == chunks.length - 1,
      s"one grams append per batch expected, head=$gramsV")
  }

  test("gram-fed delta mine == text-fed delta mine (store == fresh parity)") {
    // the round-16 rewiring claim: mining batch-touching pairs against
    // STORED grams is row-identical to re-shingling the corpus (schema
    // AND values — jaccard downstream must see the same integers)
    val corpus = docsDf(Seq(1L -> aTxt, 2L -> bTxt, 3L -> "lone text here"))
    val batch = docsDf(Seq(5L -> mTxt, 6L -> "other lone words"))
    val fresh = Dedup.pairIndexDeltaFrames(corpus, batch)
    val store = Dedup.pairIndexDeltaFromGrams(
      Dedup.gramIndex(corpus), Dedup.gramIndex(batch))
    assert(store.schema == fresh.schema,
      s"${store.schema.simpleString} != ${fresh.schema.simpleString}")
    assert(store.collect().toSet == fresh.collect().toSet)
    // and through the threshold filter both feed the same merge edges
    assert(
      Dedup.pairsFromIndex(store).select("id1", "id2").collect().toSet ==
        Dedup.pairsFromIndex(fresh).select("id1", "id2").collect().toSet)
  }

  test("gram-table OPTIMIZE dial: drain equality unchanged, index compacted, replay still a no-op") {
    val docsT = Files.createTempDirectory("graft_cs4_docs").resolve("t").toString
    val labelsT = Files.createTempDirectory("graft_cs4_lbl").resolve("t").toString
    val gramsT = s"${labelsT}_grams"
    val fn = StreamingJobs.clusterMaintainBatch(docsT, labelsT, "cs4_app",
      compactGramsEvery = 2)
    chunks.zipWithIndex.foreach { case (c, i) => fn(docsDf(c), i.toLong) }
    // labels still equal the from-scratch clustering through compactions
    val maintained = labels(CommitLog.read(spark, labelsT))
    val fromScratch = labels(Dedup.dedupClusters(docsDf(chunks.flatten)))
    assert(maintained == fromScratch)
    // compactions actually ran (3 appends + >=1 compact commit) and the
    // stored index is content-identical to fresh shingling
    assert(CommitLog.latestVersion(gramsT) > chunks.length - 1,
      "the every-2-batches compaction must have committed")
    val stored = CommitLog.read(spark, gramsT)
      .select("doc_id", "sh", "nsh").collect().toSet
    val fresh = Dedup.gramIndex(docsDf(chunks.flatten))
      .select("doc_id", "sh", "nsh").collect().toSet
    assert(stored == fresh, "compaction must preserve the gram index")
    // replay of a landed batch is still a full no-op on every table
    val (dv, gv, lv) = (CommitLog.latestVersion(docsT),
      CommitLog.latestVersion(gramsT), CommitLog.latestVersion(labelsT))
    fn(docsDf(chunks.last), (chunks.length - 1).toLong)
    assert(CommitLog.latestVersion(docsT) == dv)
    assert(CommitLog.latestVersion(gramsT) == gv)
    assert(CommitLog.latestVersion(labelsT) == lv)
  }

  test("migration backfill: a pre-gram-index state (docs+labels, no grams) is shingled once, labels stay exact (r16 advice)") {
    val docsT = Files.createTempDirectory("graft_cs5_docs").resolve("t").toString
    val labelsT = Files.createTempDirectory("graft_cs5_lbl").resolve("t").toString
    val gramsT = s"${labelsT}_grams"
    val fn = StreamingJobs.clusterMaintainBatch(docsT, labelsT, "cs5_app")
    fn(docsDf(chunks(0)), 0L)
    fn(docsDf(chunks(1)), 1L)
    // simulate the r15-era layout: docs + labels exist, no gram table
    def rmTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rmTree(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rmTree(java.nio.file.Paths.get(gramsT))
    assert(CommitLog.latestVersion(gramsT) == -1L)
    // the next batch must NOT silently mine batch-internal pairs only:
    // the backfill shingles the arrived corpus once, then the weld
    // merges across it exactly as if the index had always existed
    fn(docsDf(chunks(2)), 2L)
    val maintained = labels(CommitLog.read(spark, labelsT))
    val fromScratch = labels(Dedup.dedupClusters(docsDf(chunks.flatten)))
    assert(maintained == fromScratch,
      s"backfill must restore cross-corpus mining: $maintained != $fromScratch")
    assert(maintained(5L) == 1L, "the weld needs the backfilled corpus grams")
    // the rebuilt index is content-identical to fresh shingling
    val stored = CommitLog.read(spark, gramsT)
      .select("doc_id", "sh", "nsh").collect().toSet
    val fresh = Dedup.gramIndex(docsDf(chunks.flatten))
      .select("doc_id", "sh", "nsh").collect().toSet
    assert(stored == fresh)
    // replay of the migrating batch never re-backfills (idempotent: the
    // guard is "gram table has no commits", false from now on)
    val gv = CommitLog.latestVersion(gramsT)
    fn(docsDf(chunks(2)), 2L)
    assert(CommitLog.latestVersion(gramsT) == gv)
  }

  test("sh-clustered compaction + retention vacuum: drain equality holds, replay a no-op, sweepable set empty") {
    val docsT = Files.createTempDirectory("graft_cs6_docs").resolve("t").toString
    val labelsT = Files.createTempDirectory("graft_cs6_lbl").resolve("t").toString
    val gramsT = s"${labelsT}_grams"
    val fn = StreamingJobs.clusterMaintainBatch(docsT, labelsT, "cs6_app",
      compactGramsEvery = 2, gramsTargetFiles = 4, gramsRetainVersions = 2)
    chunks.zipWithIndex.foreach { case (c, i) => fn(docsDf(c), i.toLong) }
    // content identity through clustered compaction + vacuum
    val stored = CommitLog.read(spark, gramsT)
      .select("doc_id", "sh", "nsh").collect().toSet
    val fresh = Dedup.gramIndex(docsDf(chunks.flatten))
      .select("doc_id", "sh", "nsh").collect().toSet
    assert(stored == fresh)
    assert(labels(CommitLog.read(spark, labelsT)) ==
      labels(Dedup.dedupClusters(docsDf(chunks.flatten))))
    // the retention sweep ran: the de-referenced per-batch files are
    // physically gone (vacuumable is a pure log fold — it still LISTS
    // them; disk is the evidence)
    val sweepSet = CommitLog.vacuumable(gramsT, 2L)
    assert(sweepSet.nonEmpty, "fixture: compaction must have de-referenced files")
    sweepSet.foreach { f =>
      assert(!Files.exists(java.nio.file.Paths.get(gramsT, f)),
        s"retention must have swept $f")
    }
    // full replay after compact+vacuum: every batch short-circuits at the
    // labels watermark BEFORE any recovery read could touch swept files
    val (dv, gv, lv) = (CommitLog.latestVersion(docsT),
      CommitLog.latestVersion(gramsT), CommitLog.latestVersion(labelsT))
    chunks.zipWithIndex.foreach { case (c, i) => fn(docsDf(c), i.toLong) }
    assert(CommitLog.latestVersion(docsT) == dv)
    assert(CommitLog.latestVersion(gramsT) == gv)
    assert(CommitLog.latestVersion(labelsT) == lv)
    // the clustered layout is real: live files carry disjoint sh ranges
    val perFile = CommitLog.read(spark, gramsT)
      .withColumn("f", org.apache.spark.sql.functions.input_file_name())
      .groupBy("f")
      .agg(org.apache.spark.sql.functions.min("sh").as("mn"),
        org.apache.spark.sql.functions.max("sh").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo,
        s"clustered gram files must cover disjoint sh ranges: $perFile")
      case _ => ()
    }
  }

  test("crash between the two commits replays into a consistent merge") {
    val docsT = Files.createTempDirectory("graft_cs2_docs").resolve("t").toString
    val labelsT = Files.createTempDirectory("graft_cs2_lbl").resolve("t").toString
    val fn = StreamingJobs.clusterMaintainBatch(docsT, labelsT, "cs2_app")
    fn(docsDf(Seq(1L -> aTxt, 2L -> bTxt)), 0L)
    // simulate the crash window for batch 1: the DOCS commit landed
    // (idempotent append) but the process died before the labels commit
    CommitLog.appendIdempotent(spark, docsT, docsDf(Seq(5L -> mTxt)), "cs2_app", 1L)
    assert(CommitLog.txnLatest(labelsT, "cs2_app") == 0L,
      "fixture: labels must not have seen batch 1 yet")
    // the replayed delivery: docs watermark skips, labels recover the
    // batch rows from the docs commit and merge
    fn(docsDf(Seq(5L -> mTxt)), 1L)
    val maintained = labels(CommitLog.read(spark, labelsT))
    val fromScratch = labels(Dedup.dedupClusters(
      docsDf(Seq(1L -> aTxt, 2L -> bTxt, 5L -> mTxt))))
    assert(maintained == fromScratch, s"$maintained != $fromScratch")
    assert(maintained(5L) == 1L, "recovery must still weld through M")
    // and a SECOND replay of the same batch is a double no-op
    val dv = CommitLog.latestVersion(docsT)
    val lv = CommitLog.latestVersion(labelsT)
    fn(docsDf(Seq(5L -> mTxt)), 1L)
    assert(CommitLog.latestVersion(docsT) == dv)
    assert(CommitLog.latestVersion(labelsT) == lv)
  }

  test("state is the label catalog: two slim columns, one row per doc") {
    val docsT = Files.createTempDirectory("graft_cs3_docs").resolve("t").toString
    val labelsT = Files.createTempDirectory("graft_cs3_lbl").resolve("t").toString
    val fn = StreamingJobs.clusterMaintainBatch(docsT, labelsT, "cs3_app")
    fn(docsDf(chunks(0)), 0L)
    fn(docsDf(chunks(1)), 1L)
    fn(docsDf(chunks(2)), 2L)
    val cat = CommitLog.read(spark, labelsT)
    assert(cat.columns.toSeq == Seq("doc_id", "cluster_id"),
      "the catalog must carry labels only — no text, no pair state")
    assert(cat.count() == 4L)
  }
}
