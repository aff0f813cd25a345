package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextOps, TokenHistogram}

/** token_histogram: exact Scala-side recomputation of bucket assignment
  * and the per-source rollup; bucket boundaries are powers of two.
  */
class TokenHistogramSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = Tables.documents(spark, sf)

  test("token_histogram: buckets and rollup recompute exactly") {
    val re = TextOps.BpePattern.r
    val raw = docs.select("source", "text").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
    def bucketOf(n: Int): Long = {
      val bs = TokenHistogram.BucketBounds
      bs.sliding(2).collectFirst { case Seq(lo, hi) if n < hi => lo }
        .getOrElse(bs.last)
    }
    val perDoc = raw.map { case (src, text) => (src, bucketOf(re.findAllIn(text).length)) }
    val expected = perDoc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySource = perDoc.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = TokenHistogram.tokenHistogramQ(docs).collect()
      .map(r => ((r.getString(0), r.getInt(1).toLong), (r.getLong(2), r.getLong(3), r.getDouble(4))))
    assert(got.length == expected.size)
    got.foreach { case ((src, bucket), (nDocs, sumTokens, share)) =>
      assert(expected((src, bucket)) == nDocs, s"($src,$bucket) n_docs")
      assert(bucket == 0 || (bucket & (bucket - 1)) == 0, s"bucket $bucket not a power of two")
      val expShare = math.round(nDocs.toDouble / bySource(src) * 10000.0) / 10000.0
      assert(share == expShare, s"($src,$bucket) doc_share")
      assert(sumTokens >= nDocs * bucket, s"($src,$bucket) sum_tokens below bucket floor")
    }
    // shares sum to 1 per source
    got.groupBy(_._1._1).foreach { case (src, rows) =>
      val s = rows.map(_._2._1).sum
      assert(s == bySource(src), s"$src doc counts don't cover the source")
    }
  }
}
