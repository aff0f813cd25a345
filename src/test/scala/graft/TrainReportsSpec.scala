package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusShuffle, DupPassages, ShardManifest}

/** dup_passages + shard_manifest: planted-duplication exactness, the
  * no-global-sort top-K plan, manifest/shuffle cross-consistency, and
  * checksum recomputation.
  */
class TrainReportsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("dup_passages: planted cross-doc windows counted exactly; within-doc repeats excluded") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")   // one exact window
    val selfRep = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, boiler + " " + (1 to 8).map(i => s"x$i").mkString(" ")),
      (2L, boiler + " " + (1 to 8).map(i => s"y$i").mkString(" ")),
      (3L, boiler),
      (4L, selfRep + " " + selfRep),                        // same window twice, ONE doc
      (5L, "short tail")).toDF("doc_id", "text")
    val got = DupPassages.dupPassages(docs).collect()
      .map(r => r.getString(1) -> (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.contains(boiler), "planted boilerplate window must surface")
    assert(got(boiler) == ((md5hex(boiler), 3L, 3L, 1L)))
    assert(!got.contains(selfRep), "within-doc-only repetition is not cross-doc boilerplate")
    got.values.foreach { case (_, _, nDocs, _) => assert(nDocs >= 2) }
  }

  test("dup_passages plan: top-K via TakeOrderedAndProject, no global Sort before it") {
    val docs = Tables.documents(spark, sf)
    val plan = DupPassages.dupPassages(docs).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.linesIterator.exists(l => l.contains("Sort ") && l.contains("global=true")),
      s"top-K must not globally sort:\n$plan")
  }

  test("shard_manifest: totals, ranges and checksums recompute from corpus_shuffle exactly") {
    val docs = Tables.documents(spark, sf)
    val shuffle = CorpusShuffle.corpusShuffle(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
    val manifest = ShardManifest.shardManifest(docs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getString(5))).toMap
    val byShard = shuffle.groupBy(_._3)
    assert(manifest.keySet == byShard.keySet, "manifest covers exactly the non-empty shards")
    byShard.foreach { case (shard, members) =>
      val (nDocs, _, firstKey, lastKey, checksum) = manifest(shard)
      assert(nDocs == members.length, s"shard $shard n_docs")
      val ordered = members.sortBy(m => (m._2, m._1))
      assert(ordered.map(_._4).sameElements(1 to members.length),
        s"shard $shard: manifest order must be pos_in_shard order")
      assert(firstKey == ordered.head._2 && lastKey == ordered.last._2, s"shard $shard keys")
      assert(checksum == md5hex(ordered.map(_._1).mkString(",")), s"shard $shard checksum")
    }
    // token mass: every shard nonempty and totals sum to the corpus inventory
    val totalTokens = ShardManifest.shardManifest(docs).collect().map(_.getLong(2)).sum
    val corpusTokens = graft.operators.TextOps.tokenCount(docs)
      .selectExpr("CAST(sum(bpe_tokens) AS BIGINT)").head().getLong(0)
    assert(totalTokens == corpusTokens, "shard token masses must partition the corpus inventory")
  }

  test("shard_manifest plan: one map pass + one shard aggregation, no join") {
    val docs = Tables.documents(spark, sf)
    val plan = ShardManifest.shardManifest(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"manifest must not join:\n$plan")
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 1,
      s"one shard exchange expected:\n$plan")
  }
}
