package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ContextPack, CorpusShuffle, TextOps, Vocab}

/** vocab_build + corpus_shuffle: exact Scala-side recomputation of the
  * vocabulary counts and the shard/position assignment, the no-global-sort
  * top-K plan shape, and content-stability of the shuffle order.
  */
class VocabShuffleSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def tokens(text: String): Seq[String] =
    Option(text).getOrElse("").trim.toLowerCase.split("\\s+").toSeq

  test("vocab_build: tf/df/rank recompute exactly; top-K avoids a global sort") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // reference counts: unigrams + adjacent bigrams, occurrences for tf,
    // per-doc presence for df
    val tf = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val df = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    texts.foreach { case (_, text) =>
      val w = tokens(text)
      val terms = w ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      terms.foreach(t => tf(t) += 1)
      terms.distinct.foreach(t => df(t) += 1)
    }
    val expected = tf.keys.toSeq
      .filter(t => df(t) >= Vocab.MinDf)
      .sortBy(t => (-tf(t), t))
      .take(Vocab.VocabSize)
      .zipWithIndex
      .map { case (t, i) => (i, t, t.contains(" "), tf(t), df(t)) }
    val got = Vocab.vocabBuild(docs).orderBy("vocab_id").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))
    assert(got.length == expected.length, s"${got.length} vs ${expected.length}")
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
    // both granularities genuinely present
    assert(got.exists(_._3) && got.exists(!_._3), "expected unigrams AND bigrams")
    // the top-K is TakeOrderedAndProject (per-partition partial top-K),
    // never a full-corpus global Sort
    val plan = Vocab.vocabBuild(docs).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must plan as TakeOrderedAndProject:\n$plan")
  }

  test("corpus_shuffle: shard/key/position recompute exactly; content-keyed order") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keyed = texts.map { case (id, text) =>
      val fp = md5hex(Option(text).getOrElse("").trim.toLowerCase
        .replaceAll("\\s+", " "))
      val key = md5hex(s"graft-shuffle:$fp")
      (id, key, Integer.parseInt(key.take(CorpusShuffle.ShardDigits), 16))
    }
    val expected = keyed.groupBy(_._3).toSeq.flatMap { case (shard, members) =>
      members.sortBy(m => (m._2, m._1)).zipWithIndex
        .map { case ((id, key, _), i) => (id, key, shard, i + 1) }
    }.toSet
    val got = CorpusShuffle.corpusShuffle(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == expected)
    // every shard of the 16 is populated at 500 docs (md5 uniformity) and
    // positions are dense from 1
    val byShard = got.groupBy(_._3)
    assert(byShard.size == 16, s"expected all 16 shards populated, got ${byShard.size}")
    byShard.foreach { case (shard, members) =>
      assert(members.map(_._4).toSeq.sorted == (1 to members.size),
        s"shard $shard positions not dense")
    }
    // content-keyed: re-ingest with shifted ids yields the same
    // (key, shard, pos) stream — ids only tie-break exact duplicates, of
    // which this corpus has none
    val shifted = docs.withColumn("doc_id", col("doc_id") + 100000L)
    val re = CorpusShuffle.corpusShuffle(shifted).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(re == got.map(g => (g._2, g._3, g._4)),
      "same content must shuffle to the same order regardless of ids")
  }

  test("corpus_shuffle: the 2-digit shard dial matches integer hex parsing (256 shards)") {
    val got = CorpusShuffle.corpusShuffle(docs, digits = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    got.foreach { case (id, key, shard) =>
      assert(shard == Integer.parseInt(key.take(2), 16), s"doc $id shard from '$key'")
    }
    // ~219 of 256 shards expected populated at 500 docs (md5 uniformity)
    assert(got.map(_._3).distinct.length > 150, "2-digit dial should spread widely")
  }

  test("context_pack: both branches consume the checkpointed base — no corpus re-scan") {
    val plan = ContextPack.contextPack(docs).queryExecution.executedPlan.toString
    val ckptScans = plan.split("Scan ExistingRDD").length - 1
    assert(ckptScans == 2,
      s"expected the cumsum and totals branches to read the checkpoint ($ckptScans):\n$plan")
    assert(!plan.contains("Scan parquet"),
      s"corpus must be read only through the checkpointed base:\n$plan")
  }

  test("context_pack: global offsets and window ranges recompute exactly; stream covers every token") {
    val re = TextOps.BpePattern.r
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    // reference stream: shards in order, (key, id) within shard, running
    // global offset
    val keyed = texts.map { case (id, text) =>
      val fp = md5hex(text.trim.toLowerCase.replaceAll("\\s+", " "))
      val key = md5hex(s"graft-shuffle:$fp")
      val shard = Integer.parseInt(key.take(CorpusShuffle.ShardDigits), 16)
      (shard, key, id, re.findAllIn(text).length.toLong)
    }.sortBy(k => (k._1, k._2, k._3))
    val w = ContextPack.ContextWindowTokens
    var offset = 0L
    val expected = keyed.map { case (shard, _, id, n) =>
      val start = offset
      offset += n
      val first = start / w
      val last = (start + math.max(n, 1) - 1) / w
      (id, (shard, n, start, first, last, last - first + 1, last > first))
    }.toMap
    val got = ContextPack.contextPackQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
      .toMap
    assert(got == expected)
    // coverage: consecutive docs in stream order tile the token stream
    // with no gaps or overlaps, and the boundary flags are consistent
    val inOrder = got.values.toSeq.sortBy(_._3)
    inOrder.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 + a._2 == b._3, "stream has a gap or overlap")
      case _ =>
    }
    assert(inOrder.exists(_._7), "expected at least one boundary-crossing doc")
    // determinism across runs
    val again = ContextPack.contextPackQ(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == got.view.mapValues(_._3).toMap)
  }

  test("context_window_docs: reverse index is the exact transpose of context_pack") {
    val pack = ContextPack.contextPackQ(docs).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    val expected = pack.flatMap { case (id, first, last) =>
      (first to last).map(w => w -> id)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val got = ContextPack.contextWindowDocsQ(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(got.keySet == expected.keySet, "window id sets differ")
    got.foreach { case (w, (nDocs, firstDoc, lastDoc, csv)) =>
      val docsIn = expected(w)
      assert(nDocs == docsIn.length, s"window $w n_docs")
      assert(firstDoc == docsIn.min && lastDoc == docsIn.max, s"window $w doc range")
      assert(csv == docsIn.mkString(","), s"window $w contributor list")
    }
    // windows tile the stream: ids are dense from 0, every window has ≥1
    // contributor, and neighbors share only boundary-crossing docs
    val ids = got.keys.toSeq.sorted
    assert(ids.head == 0L && ids == (0L until ids.length.toLong), "window ids not dense")
  }
}
