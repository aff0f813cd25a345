package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.{KnnMutual, Lsh, Parity, Similarity}

/** Focused measurement for the LSH-geometry ADVISOR (round 15): per
  * (bits, mp) arm, row equality against the exact twins + wall cost, for
  * BOTH hyperplane-LSH consumers families — the mutual-kNN graph (whose
  * recall-1 width is the widest: the top-k contract reaches into
  * mid-cosine space) and the τ-threshold pair miner. The advisor
  * ([[graft.operators.LshGeometryPlan]]) recommends a geometry from the
  * corpus count; this main is the evidence base that the recommended arm
  * is full-row-equal at the gate SFs and crosses under brute at 10×.
  *
  * Usage: `runMain graft.MeasureGeometry [sfDir] [--x10]` — `--x10`
  * replicates the corpus 10× (the MeasureMutual generator: one
  * milli-component perturbation per replica). */
object MeasureGeometry {
  def main(args: Array[String]): Unit = {
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)

    // --xN replicates the corpus N× (the MeasureMutual generator: one
    // milli-component perturbation per replica); --x10 kept as the
    // historical alias
    val reps = args.collectFirst { case a if a.startsWith("--x") =>
      a.stripPrefix("--x").toInt }.getOrElse(1)
    val emb0 = Tables.embeddings(spark, sfDir)
    val emb =
      if (reps <= 1) emb0
      else {
        import org.apache.spark.sql.functions._
        val rep = emb0.withColumn("r", explode(expr(s"sequence(0, ${reps - 1})")))
          .select((col("vec_id") * lit(reps.toLong) + col("r")).as("vec_id"),
            expr("transform(embedding, (e, i) -> CAST(e + CASE WHEN i = r % size(embedding) THEN 0.001 ELSE 0.0 END AS FLOAT))")
              .as("embedding"),
            col("label"))
        val path = s"/tmp/graft_geom${reps}x"
        if (!new java.io.File(path, "_SUCCESS").exists())
          rep.repartition(32).write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
    val n = emb.count()
    println(s"GEOM corpus n=$n sf=$sfDir reps=$reps")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def rows(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Array[String] =
      df.select(cols.head, cols.tail: _*).collect().map(_.toString).sorted

    val mutualCols = Seq("id1", "id2", "rank12", "rank21", "cos")
    val pairCols = Seq("id1", "id2", "cos")
    def mutualProj(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id1"), col("id2"), col("rank12"), col("rank21"),
        Parity.r("cos", 4))
    def pairProj(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id1"), col("id2"), Parity.r("cos", 4))

    val (exactM, tM) = timed(rows(mutualProj(KnnMutual.knnMutual(emb)), mutualCols))
    println(f"MUTUAL_EXACT rows=${exactM.length} t=$tM%.1fs")
    val (exactP, tP) = timed(rows(pairProj(Similarity.embeddingDedup(emb)), pairCols))
    println(f"PAIR_EXACT rows=${exactP.length} t=$tP%.1fs")

    if (args.contains("--advisor")) {
      // the round-15 advisor loop end-to-end: derive the recommendation
      // from the corpus's own plan, run the planned consumers, compare
      // against the exact twins — the "advisor's pick crosses under
      // brute" evidence row
      import graft.operators.LshGeometryPlan
      val (plan, tPlan) = timed(
        LshGeometryPlan.lshGeometryPlan(emb).localCheckpoint())
      println(f"PLAN t=$tPlan%.1fs mutual=" +
        LshGeometryPlan.geometryFromPlan(plan, "mutual") +
        " pair=" + LshGeometryPlan.geometryFromPlan(plan, "pair"))
      val (m, tm) = timed(rows(
        mutualProj(LshGeometryPlan.knnMutualPlanned(emb, plan)), mutualCols))
      println(f"ADVISOR_MUTUAL rows=${m.length} " +
        f"equal=${m.sameElements(exactM)} t=$tm%.1fs (exact $tM%.1fs)")
      val (p, tp) = timed(rows(
        pairProj(LshGeometryPlan.embeddingDedupPlanned(emb, plan)), pairCols))
      println(f"ADVISOR_PAIR rows=${p.length} " +
        f"equal=${p.sameElements(exactP)} t=$tp%.1fs (exact $tP%.1fs)")
    } else {
      val grid = Seq(5, 6, 7, 8).flatMap(bits => Seq(2, 3).map(mp => (bits, mp)))
      grid.foreach { case (bits, mp) =>
        val (m, tm) = timed(rows(
          mutualProj(KnnMutual.knnMutualLsh(emb, multiProbe = mp, bits = bits)),
          mutualCols))
        println(f"MUTUAL_LSH bits=$bits mp=$mp rows=${m.length} " +
          f"equal=${m.sameElements(exactM)} t=$tm%.1fs")
        val (p, tp) = timed(rows(
          pairProj(Lsh.embeddingDedupLsh(emb, multiProbe = mp, bits = bits)),
          pairCols))
        println(f"PAIR_LSH bits=$bits mp=$mp rows=${p.length} " +
          f"equal=${p.sameElements(exactP)} t=$tp%.1fs")
      }
    }
    spark.stop()
  }
}
