package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SourceRank

/** source_pagerank — distributed iteration vs a driver-side replay of the
  * same integer recurrence, mass conservation under floor leakage,
  * symmetric-graph equality, and the isolated-node base value. */
class SourceRankSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  /** Driver-side replay of the exact recurrence from a collected edge
    * list — an independent implementation of the LOOP (the edge
    * derivation is deliberately shared; what's under test is the
    * distributed iteration). */
  private def replay(nodes: Seq[String],
                     edges: Seq[(String, String, Long)]): Map[String, Long] = {
    val n = nodes.size.toLong
    val wtot = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r: Map[String, Long] = nodes.map(_ -> SourceRank.Scale / n).toMap
    (1 to SourceRank.Iters).foreach { _ =>
      val c = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => r(src) * w / wtot(src) }.sum
      }
      r = nodes.map(s =>
        s -> (15L * SourceRank.Scale / (100L * n) + 85L * c.getOrElse(s, 0L) / 100L)).toMap
    }
    r
  }

  test("gate corpus: distributed ranks equal the driver-side integer replay") {
    val ss = docs
      .select(col("source"), expr("split(lower(trim(text)), '\\\\s+')").as("w"))
      .select(col("source"), explode(expr(
        "array_distinct(transform(slice(w, 1, size(w) - 1), (x, i) -> concat(x, ' ', w[i + 1])))"))
        .as("sh")).distinct().localCheckpoint()
    val nodes = ss.select("source").distinct().as[String].collect().toSeq.sorted
    val edges = ss.as("a").join(ss.as("b"), Seq("sh"))
      .filter(col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("src"), col("b.source").as("dst"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(edges.nonEmpty, "gate sources share no shingles — replay vacuous")
    val want = replay(nodes, edges)
    val got = SourceRank.sourcePagerank(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"iteration diverged from the replay")
    val mass = got.values.sum
    assert(mass <= SourceRank.Scale && mass > SourceRank.Scale / 2,
      s"rank mass $mass outside (Scale/2, Scale] — floor leakage broke")
  }

  test("symmetric complete graph: every source ranks equally") {
    val fix = (0 until 4).map(i =>
      (i.toLong, "common token here", "en", s"s$i", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ranks = SourceRank.sourcePagerank(fix).collect().map(_.getLong(1)).toSet
    assert(ranks.size == 1, s"symmetric graph ranks diverged: $ranks")
  }

  test("isolated source receives exactly the base term") {
    val fix = Seq(
      (0L, "shared pair one", "en", "a", 15L),
      (1L, "shared pair two", "en", "b", 15L),
      (2L, "totally different words", "en", "c", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = SourceRank.sourcePagerank(fix).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = 15L * SourceRank.Scale / (100L * 3)
    assert(got("c") == base, s"isolated rank ${got("c")} != base $base")
    assert(got("a") > base && got("b") > base, "connected sources should beat base")
  }
}
