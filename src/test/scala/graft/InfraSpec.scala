package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, SignalOps}

/** §D sink/infrastructure behavior: partitioned-write + partition pruning
  * (the reference writes Delta partitioned by synset/channel,
  * /root/reference/main/silver.py:75-84 — parquet + deterministic layout
  * stands in offline), and temp-view + spark.sql parity. */
class InfraSpec extends AnyFunSuite {
  import SparkTestSession._

  test("partitionBy(channel) write prunes partitions on read-back") {
    val out = Files.createTempDirectory("graft-gold-part").toString
    val gold = SignalOps.goldTrialStats(SignalOps.silver(Tables.events(spark, sf)))
    gold.write.mode("overwrite").partitionBy("channel").parquet(out)

    // layout: one directory per channel
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("channel=")), dirs.mkString(","))

    val back = spark.read.parquet(out).filter(col("channel") === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("channel"),
      s"no partition filter in scan:\n$plan")
    // pruning actually applied: only the matching partition is read
    val expected = gold.filter(col("channel") === "click").count()
    assert(back.count() == expected && expected > 0)
  }

  test("temp-view spark.sql runs the oracle SQL dialect for shared queries") {
    // these oracle strings are ANSI enough to run unmodified on Spark —
    // same text, DataFrame plan vs spark.sql plan, identical results
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")

    val viaSql = spark.sql(Relational.q1AggSql).collect().map(_.toString).sorted
    val viaDf = Relational.q1Agg(Tables.lineitem(spark, sf)).collect().map(_.toString).sorted
    assert(viaSql.sameElements(viaDf))

    val topkSql = spark.sql(Relational.windowTopKPerGroupSql).collect().map(_.toString).sorted
    val topkDf = Relational.windowTopKPerGroup(Tables.orders(spark, sf)).collect().map(_.toString).sorted
    assert(topkSql.sameElements(topkDf))
  }
}
