package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions installation: a USER-created session with
  * `spark.sql.extensions=graft.GraftExtensions` gets graft's SQL
  * functions; fingerprint parity with the operators' shared expression
  * text; session isolation (the hook does not leak into other sessions).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions hook installs graft_dot and graft_fingerprint in SQL") {
    // `spark.sql.extensions` is a STATIC conf — honored only when the
    // FIRST session of the JVM boots (i.e. at spark-submit, the
    // deployment path in the scaladoc). The shared test context already
    // exists here, so the spec drives the same hook programmatically.
    val orig = SparkTestSession.spark // materialize the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(s2 ne orig, "expected a fresh session for the extension hook")
      val d = s2.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head.getDouble(0)
      assert(d == 11.0)
      // fingerprint contract: identical to the operators' FpExpr text
      val fp = s2.sql("SELECT graft_fingerprint('  A    b ') AS fp").head.getString(0)
      val expected = s2.sql("SELECT md5('a b') AS fp").head.getString(0)
      assert(fp == expected)
      // NULL-total like every operator fingerprint (empty-string md5)
      val fpNull = s2.sql("SELECT graft_fingerprint(CAST(NULL AS STRING)) AS fp")
        .head.getString(0)
      assert(fpNull == s2.sql("SELECT md5('') AS fp").head.getString(0))
      // isolation: the shared session never saw the injection
      assert(!orig.catalog.functionExists("graft_fingerprint"))
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
