package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main. Runs every registered query twice (first pass = JVM/JIT
  * and codegen warmup, second pass timed) against a `noop`-format write so
  * the full plan executes — `count()` would let Catalyst prune computed
  * columns out of the plan and under-report.
  *
  * Emits ONE JSON line on stdout AND writes the same line to
  * `BENCH_OUT.json` in the cwd (sbt log noise makes stdout alone
  * unparseable). Query failures are reported in an `"errors"` object, never
  * as fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        // strip every char that could break the JSON string literal,
        // including backslashes (Spark errors often quote regexes)
        case e: Throwable => Left(e.toString.replaceAll("[\\\\\"\\n\\r\\t]", " ").take(300))
      } finally {
        // drop this query's leftovers (localCheckpoint RDDs, caches) so a
        // long suite doesn't let one query's residue distort the next
        // query's timing — cleanup runs after the clock stops
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
      }
    }

    // a typo'd name must surface in "errors", not silently shrink the run
    val (names, unknown) =
      if (args.nonEmpty) args.toSeq.distinct.sorted.partition(SparkEntry.queries.contains)
      else (SparkEntry.queries.keys.toSeq.sorted, Seq.empty[String])
    names.foreach(run) // warmup
    val results = names.map(n => n -> run(n))
    val timings = results.collect { case (n, Right(t)) => n -> t }
    val errors = results.collect { case (n, Left(e)) => n -> e } ++
      unknown.map(n => n -> "unknown query name")
    // Locale.ROOT: the f-interpolator is default-locale-sensitive and a
    // comma decimal separator would break the JSON
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = timings.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = timings.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH_OUT.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
