package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.{Ivf, KnnMutual, Lsh, Similarity}

/** Scratch measurement: knn_cosine_lsh recall vs brute at each multiProbe
  * level on the gate corpus (sf0.01 embeddings). Decides round-4 advice #7:
  * can the no_oracle row turn green at a provable-recall configuration? */
object MeasureRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // second arg overrides parallelism — the IVF table below exists to
    // prove the deterministic quantizer gives identical answers under
    // different masters (run with local[4] / local[8] / local[32])
    val master = if (args.length > 1) args(1) else "local[32]"
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExprs.register(spark)

    val emb = Tables.embeddings(spark, sfDir)
    val brute = Similarity.knnCosineBrute(emb)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 to 4).foreach { mp =>
      val lsh = Lsh.knnCosineLsh(emb, multiProbe = mp)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & lsh).size.toDouble / brute.size
      val exact = lsh == brute
      println(f"RECALL mp=$mp recall=$recall%.4f exact_set=$exact lsh_rows=${lsh.size}")
    }
    // IVF at each probe width vs brute (round-6, deterministic quantizer):
    // the full-row fingerprint + assignment fingerprint let two runs under
    // different masters be compared line-for-line
    val idx = Ivf.buildIndex(emb)
    val assignFp = idx.assigned.select("vec_id", "cluster").collect()
      .map(r => s"${r.getLong(0)}:${r.getInt(1)}").sorted.mkString(",").hashCode
    println(s"IVF_ASSIGN master=$master fp=$assignFp")
    val bruteRows = Similarity.knnCosineBruteQ(emb).collect().map(_.toString).sorted
    (1 to Ivf.NumCentroids).foreach { np =>
      val ivfRows = Ivf.searchIndex(idx, nProbe = np)
        .orderBy("query_id", "rank").collect().map(_.toString).sorted
      val ivfSet = Ivf.searchIndex(idx, nProbe = np)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (brute & ivfSet).size.toDouble / brute.size
      println(f"IVF np=$np%2d recall=$recall%.4f rows_equal_brute=${ivfRows.sameElements(bruteRows)}")
    }

    val exactPairs = Similarity.embeddingDedup(emb)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 to 3).foreach { mp =>
      val mined = Lsh.embeddingDedupLsh(emb, multiProbe = mp)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exactPairs & mined).size.toDouble / exactPairs.size
      println(f"PAIR_RECALL mp=$mp recall=$recall%.4f pairs=${mined.size}/${exactPairs.size}")
    }

    // round-14: the mutual-kNN candidate path — pair recall AND full-row
    // equality per probe width (rows compare ranks/cosines too, the oracle
    // condition), plus the cluster labeling identity
    val exactMutualRows = KnnMutual.knnMutualQ(emb).collect().map(_.toString).sorted
    val exactMutual = KnnMutual.knnMutual(emb)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 to 3).foreach { mp =>
      val lshRows = KnnMutual.knnMutualLsh(emb, multiProbe = mp)
        .select(col("id1"), col("id2"), col("rank12"), col("rank21"),
          graft.operators.Parity.r("cos", 4))
        .collect().map(_.toString).sorted
      val lshSet = KnnMutual.knnMutualLsh(emb, multiProbe = mp)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exactMutual & lshSet).size.toDouble / exactMutual.size.max(1)
      println(f"MUTUAL mp=$mp recall=$recall%.4f rows_equal=${lshRows.sameElements(exactMutualRows)} " +
        s"pairs=${lshSet.size}/${exactMutual.size}")
    }
    val exactMutualClusters = KnnMutual.knnMutualClusters(emb)
      .select("vec_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 to 3).foreach { mp =>
      val got = KnnMutual.knnMutualClustersLsh(emb, multiProbe = mp)
        .select("vec_id", "cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"MUTUAL_CLUSTER mp=$mp identical=${got == exactMutualClusters} " +
        s"diff=${(exactMutualClusters diff got).size}")
    }

    // round-9: does the LSH pair graph induce the EXACT component
    // labeling? (components need connectivity, not every edge — pair
    // recall < 1 can still give cluster identity)
    val exactClusters = Similarity.embeddingClusters(emb)
      .select("vec_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 to 2).foreach { mp =>
      val lshClusters = Similarity.embeddingClustersLsh(emb, multiProbe = mp)
        .select("vec_id", "cluster_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"CLUSTER mp=$mp identical=${lshClusters == exactClusters} " +
        s"diff=${(exactClusters diff lshClusters).size}")
    }
    spark.stop()
  }
}
