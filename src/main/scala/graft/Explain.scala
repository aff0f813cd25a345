package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for registered queries.
  * `runMain graft.Explain [names…]` — no args = all queries. Used for the
  * per-round plan audit (pushdown, broadcasts, no stray cartesians,
  * WholeStageCodegen coverage). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // round 17: lets the planner use a streaming SortAggregate when an
      // aggregation's input is ALREADY sorted on the grouping keys (it
      // never introduces a sort) — the pair miners sort their candidate
      // exchanges exactly for this (Dedup.ngramJaccardPairs; measured
      // 14.9 -> 5.7 s on the tau=0 index, MeasureAgg V6/V7)
      .config("spark.sql.execution.replaceHashWithSortAgg", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
