package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Round-17 plan ground truth: print the FINAL (post-AQE) executed plan of
  * registered queries under the Bench session config — `explain` before
  * execution only shows the initial plan, and the round's agg/join rules
  * (replaceHashWithSortAgg, AQE join rewrites) fire per stage at runtime. */
object MeasurePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.execution.replaceHashWithSortAgg", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var last: QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        last = qe
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_ngram_jaccard")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(1500) // let the QueryExecutionListener fire
      println(s"\n===================== $n (final adaptive) =====================")
      println(last.executedPlan.toString.take(12000))
    }
    spark.stop()
  }
}
