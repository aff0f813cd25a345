package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.OrcRoundtrip

/** ORC format fidelity beyond the gate query's flat-row identity:
  * nested array<float> round-trip (embeddings), double round-trip
  * (lineitem prices bit-exact), and read-side pushdown/pruning — the
  * scan must carry the filter and read only requested columns. */
class OrcSpec extends AnyFunSuite {
  import SparkTestSession._

  test("embeddings: array<float> survives ORC bit-exactly (both directions empty except)") {
    val e = Tables.embeddings(spark, sf)
    val dir = Files.createTempDirectory("graft_orc_emb").resolve("e").toString
    e.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(e).count() == 0 && e.exceptAll(back).count() == 0,
      "embeddings round-trip not identical")
  }

  test("lineitem doubles and timestamps survive ORC bit-exactly") {
    val l = Tables.lineitem(spark, sf)
    val dir = Files.createTempDirectory("graft_orc_li").resolve("l").toString
    l.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(l).count() == 0 && l.exceptAll(back).count() == 0,
      "lineitem round-trip not identical")
  }

  test("ORC read side: filter pushed to the scan, schema pruned to selected columns") {
    val docs = Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("graft_orc_push").resolve("d").toString
    docs.write.mode("overwrite").orc(dir)
    val q = spark.read.orc(dir).filter(col("doc_id") > 10).select("doc_id", "source")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      s"schema not pruned:\n$plan")
  }

  test("gate query: round-tripped row count equals the corpus") {
    assert(OrcRoundtrip.orcRoundtripQ(Tables.documents(spark, sf)).count() ==
      Tables.documents(spark, sf).count())
  }
}
