package graft

import org.apache.spark.sql.SparkSession

import graft.operators.KnnMutual

/** Focused measurement: the mutual-kNN LSH candidate path's row equality
  * and wall cost per probe width, at an arbitrary SF — the gate-width
  * decision for knn_mutual_lsh needs BOTH gate SFs (round 14: mp=2 was
  * recall 1 at sf0.01 but missed 1 of 3800 pairs at sf0.1 — the mutual
  * contract needs ALL top-k neighbors, including mid-cosine ones the
  * threshold miner never looks at, so its recall-1 width is wider). */
object MeasureMutual {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)

    // `--x10` replicates the corpus 10× (the StressCuration emb10
    // generator: one milli-component perturbation per replica) for the
    // exact-vs-LSH growth statement at the registered probe width
    val x10 = args.contains("--x10")
    val emb0 = Tables.embeddings(spark, sfDir)
    val emb =
      if (!x10) emb0
      else {
        import org.apache.spark.sql.functions._
        val rep = emb0.withColumn("r", explode(expr("sequence(0, 9)")))
          .select((col("vec_id") * lit(10L) + col("r")).as("vec_id"),
            expr("transform(embedding, (e, i) -> CAST(e + CASE WHEN i = r % size(embedding) THEN 0.001 ELSE 0.0 END AS FLOAT))")
              .as("embedding"),
            col("label"))
        val path = "/tmp/graft_mutual10x"
        if (!new java.io.File(path, "_SUCCESS").exists())
          rep.repartition(32).write.mode("overwrite").parquet(path)
        spark.read.parquet(path)
      }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, tEx) = timed(KnnMutual.knnMutualQ(emb).collect().map(_.toString).sorted)
    println(f"MUTUAL_EXACT sf=$sfDir rows=${exact.length} t=$tEx%.1fs")
    // registered geometry per probe width, then the corpus-size dial:
    // wider keyspaces (more bits ⇒ smaller buckets) at 10× — the "raise
    // NBits with log2(corpus)" operating points the LSH docs cite
    val grid =
      if (x10) Seq((5, 2), (5, 3), (6, 2), (6, 3), (7, 2), (7, 3), (8, 2), (8, 3))
      else Seq((5, 2), (5, 3), (5, 4))
    grid.foreach { case (bits, mp) =>
      val (rows, t) = timed(
        KnnMutual.knnMutualLsh(emb, multiProbe = mp, bits = bits)
          .select(org.apache.spark.sql.functions.col("id1"),
            org.apache.spark.sql.functions.col("id2"),
            org.apache.spark.sql.functions.col("rank12"),
            org.apache.spark.sql.functions.col("rank21"),
            graft.operators.Parity.r("cos", 4))
          .collect().map(_.toString).sorted)
      println(f"MUTUAL_LSH bits=$bits mp=$mp rows=${rows.length} " +
        f"equal=${rows.sameElements(exact)} t=$t%.1fs")
    }
    spark.stop()
  }
}
