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

    val emb = Tables.embeddings(spark, sfDir)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, tEx) = timed(KnnMutual.knnMutualQ(emb).collect().map(_.toString).sorted)
    println(f"MUTUAL_EXACT sf=$sfDir rows=${exact.length} t=$tEx%.1fs")
    (2 to 4).foreach { mp =>
      val (rows, t) = timed(
        KnnMutual.knnMutualLsh(emb, multiProbe = mp)
          .select(org.apache.spark.sql.functions.col("id1"),
            org.apache.spark.sql.functions.col("id2"),
            org.apache.spark.sql.functions.col("rank12"),
            org.apache.spark.sql.functions.col("rank21"),
            graft.operators.Parity.r("cos", 4))
          .collect().map(_.toString).sorted)
      println(f"MUTUAL_LSH mp=$mp rows=${rows.length} equal=${rows.sameElements(exact)} t=$t%.1fs")
    }
    spark.stop()
  }
}
