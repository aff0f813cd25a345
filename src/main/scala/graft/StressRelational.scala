package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement: the relational classics at sf1 volume. The
  * corpus/embedding operators have 10× StressCuration numbers; the q1–q19
  * family, cube/rollup, equidepth and rfm had only ever run at the sf0.1
  * gate — a hidden one-reducer ceiling (a window without a partition key,
  * an agg funneling into one task) would be invisible there and fatal at
  * 100 TB. This main builds a 10×-sf0.1 (= sf1-scale) TPC-H-ish dataset by
  * KEY-SHIFTED replication — replica r adds r·10⁶ to every join key
  * (orderkey, custkey, partkey, suppkey) on BOTH sides, so each replica is
  * a disjoint parallel universe: join fan-outs, filter selectivities and
  * per-key skew are preserved exactly while volumes scale 10×. Dates and
  * dims (region/nation) stay fixed. Linear operators should land ≤ ~12×
  * wall (10× data plus constant overheads); anything materially above
  * that is a scaling bug to name and fix (PERF.md records the table).
  *
  * Timings drive the REGISTERED queries through `SparkEntry.queries`
  * verbatim — same plans the driver gates, no bespoke stress forms. */
object StressRelational {

  private val Off = 1000000L
  private val Reps = 10

  private def shifted(df: DataFrame, keys: Seq[String]): DataFrame = {
    val rep = df.withColumn("r", explode(expr(s"sequence(0, ${Reps - 1})")))
    keys.foldLeft(rep)((d, k) => d.withColumn(k, col(k) + col("r") * Off))
      .drop("r")
  }

  /** The relational battery: the q-classics plus the plan classes the
    * judge called out (cube/rollup, equidepth, rfm, window-topk). */
  val Queries: Seq[String] = Seq(
    "q1_agg", "q3_topk", "q4_late_exists", "q5_multijoin", "q7_trade_volume",
    "q10_returned_topk", "q14_promo_share", "q15_top_supplier",
    "q17_avg_filter", "q18_large_orders", "q19_disjunctive",
    "window_topk_per_group", "rollup_agg", "cube_agg", "grouping_sets_agg",
    "semi_anti_join",
    "incremental_new_keys", "equidepth_hist", "rfm_segment",
    // round 10 (closing session): the set-completing classics + the
    // join-size sketch (map-side sample kill before two count exchanges)
    "q6_forecast_revenue", "q20_part_promotion", "join_size_estimate")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled: Seq[(String, DataFrame)] = Seq(
      "region" -> Tables.region(spark, baseDir),
      "nation" -> Tables.nation(spark, baseDir),
      "customer" -> shifted(Tables.customer(spark, baseDir), Seq("c_custkey")),
      "supplier" -> shifted(Tables.supplier(spark, baseDir), Seq("s_suppkey")),
      "part" -> shifted(Tables.part(spark, baseDir), Seq("p_partkey")),
      "orders" -> shifted(Tables.orders(spark, baseDir),
        Seq("o_orderkey", "o_custkey")),
      "lineitem" -> shifted(Tables.lineitem(spark, baseDir),
        Seq("l_orderkey", "l_partkey", "l_suppkey")))
    scaled.foreach { case (name, df) =>
      val path = s"$workDir/$name.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists())
        // real-corpus shape, not one local file: a single-file scan side
        // serializes every downstream join (the StressCuration harness
        // lesson, PERF.md r8) — write the fact tables 32-way
        df.repartition(if (df.columns.length > 4) 32 else 1)
          .write.mode("overwrite").parquet(path)
    }

    def time(name: String, dir: String): Double = {
      val passes = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      passes.min
    }

    Queries.foreach(time(_, baseDir)) // warmup (JIT + codegen)
    Queries.foreach { q =>
      val t1 = time(q, baseDir)
      val t10 = time(q, workDir)
      println(f"TIME query=$q sf01=$t1%.2f sf1=$t10%.2f factor=${t10 / math.max(t1, 0.01)}%.1f")
    }
    spark.stop()
  }
}
