package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UrlFilter

/** url_domain_filter: exact Scala-side recomputation over the fixture,
  * the planted traps (case-hidden blocklist domain, trailing punctuation,
  * ftp non-match, link farm), and the zero-exchange plan shape.
  */
class UrlFilterSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val out = UrlFilter.urlDomainFilterQ(spark).collect()
    .map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getString(3), r.getBoolean(4),
        r.getDouble(5), r.getBoolean(6)))
    .toMap

  test("url_domain_filter: every column recomputes exactly over the fixture") {
    val raw = spark.read
      .schema("doc_id LONG, text STRING")
      .json(s"${UrlFilter.FixtureDir}/*.jsonl")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    assert(raw.length == out.size && raw.nonEmpty)
    val urlRe = UrlFilter.UrlRe.r
    val domRe = UrlFilter.DomainRe.r
    raw.foreach { case (id, text) =>
      val urls = urlRe.findAllIn(text).toSeq
      val domains = urls.map(u => domRe.findFirstMatchIn(u).get.group(1).toLowerCase)
      val distinct = domains.distinct.sorted
      val nTokens = text.trim.split("\\s+").length
      val density = math.round(urls.length.toDouble / nTokens * 10000.0) / 10000.0
      val blocked = domains.exists(UrlFilter.BlockedDomains.contains)
      val (gU, gD, gCsv, gB, gDen, gK) = out(id)
      assert(gU == urls.length, s"doc $id n_urls")
      assert(gD == distinct.length, s"doc $id n_domains")
      assert(gCsv == distinct.mkString(","), s"doc $id domains_csv")
      assert(gB == blocked, s"doc $id has_blocked")
      assert(gDen == density, s"doc $id link_density")
      assert(gK == (!blocked &&
        urls.length.toDouble / nTokens <= UrlFilter.MaxLinkDensity), s"doc $id keep")
    }
  }

  test("url_domain_filter: planted traps fire") {
    // doc 2: SPAM.example.com lowercases into the blocklist
    assert(out(2L)._4 && !out(2L)._6)
    // doc 4: three URLs, one distinct domain (case-folded)
    assert(out(4L)._1 == 3 && out(4L)._2 == 1 && out(4L)._3 == "mirror1.example.org")
    // doc 5: trailing ')' and '.' stay outside the URL match
    assert(out(5L)._1 == 2 && out(5L)._3 == "docs.example.io,ex.io")
    // doc 7: NULL text → zero URLs, keep
    assert(out(7L) == ((0, 0, "", false, 0.0, true)))
    // doc 8: the ftp scheme does not match; the https one does
    assert(out(8L)._1 == 1 && out(8L)._3 == "new.example.com")
    // doc 9: link farm rejected on density alone (no blocklist hit)
    assert(!out(9L)._4 && out(9L)._5 > UrlFilter.MaxLinkDensity && !out(9L)._6)
  }

  test("url_domain_filter: pure map pass — no exchange before the output sort") {
    val p = UrlFilter.urlDomainFilterQ(spark).queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"url_domain_filter must not shuffle before the output sort:\n$p")
  }
}
