package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{KnnMutual, LshGeometryPlan, Similarity}

/** Gates for the round-15 hyperplane-LSH geometry advisor: the
  * certificate machinery's soundness (conservative, monotone, a valid
  * angle bound), the BRUTE recommendation at gate sizes (matching the
  * measured crossover), and — the load-bearing row — the LSH arm
  * exercised END-TO-END on a planted replica corpus where the advisor's
  * own cost model picks it, with full-row equality against the exact
  * operator (what lets the planned queries share the exact oracles). */
class LshGeometrySpec extends AnyFunSuite {
  import SparkTestSession._

  private val gateSf = "/root/testdata/sf0.01"

  /** 20 families × 10 near-identical replicas (the 10×-stress corpus
    * shape at spec scale): every vector's top-k are its own family, so
    * the sampled k-th-neighbor floor is ≈1 and cheap probe widths
    * certify — the corpus-property the advisor exists to read. */
  private def replicaCorpus(): DataFrame = {
    val rnd = new scala.util.Random(7)
    val bases = IndexedSeq.fill(20)(IndexedSeq.fill(64)(rnd.nextGaussian().toFloat))
    val rows = for (fam <- 0 until 20; r <- 0 until 10) yield {
      val v = bases(fam).zipWithIndex.map { case (x, i) =>
        if (i == r % 64) x + 0.001f else x
      }.toArray
      (fam * 10L + r, v, fam)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label").repartition(8)
  }

  private def mutualRows(df: DataFrame): Seq[String] =
    df.select(org.apache.spark.sql.functions.col("id1"),
      org.apache.spark.sql.functions.col("id2"),
      org.apache.spark.sql.functions.col("rank12"),
      org.apache.spark.sql.functions.col("rank21"),
      graft.operators.Parity.r("cos", 4))
      .collect().map(_.toString).sorted.toSeq

  test("replica corpus: advisor picks an LSH arm and planned == exact, full rows") {
    val emb = replicaCorpus()
    val plan = LshGeometryPlan.lshGeometryPlan(emb).localCheckpoint()
    val geo = LshGeometryPlan.geometryFromPlan(plan, "mutual")
    assert(geo.isDefined, "the replica corpus must clear the cost model")
    val (bits, mp) = geo.get
    // the keyspace must fit the corpus and the width must be certified
    assert((1L << bits) <= 200L)
    assert(mp >= 0 && mp <= LshGeometryPlan.MpMax)
    val exact = mutualRows(KnnMutual.knnMutual(emb))
    val planned = mutualRows(LshGeometryPlan.knnMutualPlanned(emb, plan))
    assert(exact.nonEmpty)
    assert(planned == exact,
      s"planned(bits=$bits, mp=$mp) diverges: " +
        s"missing=${(exact.toSet -- planned.toSet).take(2)} " +
        s"extra=${(planned.toSet -- exact.toSet).take(2)}")
    // the third consumer family: top-k ANN at the same mutual-certified
    // geometry equals brute on the sampled queries
    def knnRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(org.apache.spark.sql.functions.col("query_id"),
        org.apache.spark.sql.functions.col("neighbor_id"),
        org.apache.spark.sql.functions.col("rank"),
        graft.operators.Parity.r("cos", 4))
        .collect().map(_.toString).sorted.toSeq
    val knnExact = knnRows(Similarity.knnCosineBrute(emb))
    val knnPlanned = knnRows(LshGeometryPlan.knnCosinePlanned(emb, plan))
    assert(knnExact.nonEmpty && knnPlanned == knnExact)
  }

  test("gate corpus: advisor honestly recommends brute; planned == exact wiring") {
    // measured (PERF.md round 15): at ≤2k natural vectors every LSH
    // geometry loses to the exact operators — the advisor's cost model
    // must agree, and the planned consumers must take the exact branch
    val emb = Tables.embeddings(spark, gateSf)
    val plan = LshGeometryPlan.lshGeometryPlan(emb).localCheckpoint()
    assert(LshGeometryPlan.geometryFromPlan(plan, "mutual").isEmpty,
      "gate-size corpora are below the LSH crossover")
    assert(LshGeometryPlan.geometryFromPlan(plan, "pair").isEmpty)
    val exact = mutualRows(KnnMutual.knnMutual(emb))
    val planned = mutualRows(LshGeometryPlan.knnMutualPlanned(emb, plan))
    assert(planned == exact)
    val exactP = Similarity.embeddingDedup(emb)
      .select("id1", "id2").collect().map(_.toString).sorted
    val plannedP = LshGeometryPlan.embeddingDedupPlanned(emb, plan)
      .select("id1", "id2").collect().map(_.toString).sorted
    assert(plannedP.sameElements(exactP))
  }

  test("plan-as-data: plan -> parquet -> read-back -> identical consumer rows") {
    val emb = replicaCorpus()
    val plan = LshGeometryPlan.lshGeometryPlanQ(emb).localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft_geoplan").toString
    plan.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(LshGeometryPlan.geometryFromPlan(back, "mutual") ==
      LshGeometryPlan.geometryFromPlan(plan, "mutual"))
    val direct = mutualRows(LshGeometryPlan.knnMutualPlanned(emb, plan))
    val persisted = mutualRows(LshGeometryPlan.knnMutualPlanned(emb, back))
    assert(persisted == direct)
  }

  test("fingerprint-keyed plan store: store == inline on build AND read-back") {
    // round 16 (the r15 verdict's #6 order): the registered queries read
    // the advisor frame from the store — one plan pass per corpus, four
    // consumers; identity must hold both on first build (mine+persist)
    // and on the read-back path (the AnnOracleSpec store precedent)
    val emb = replicaCorpus()
    val inline = LshGeometryPlan.lshGeometryPlan(emb)
      .collect().map(_.toString).sorted.toSeq
    val firstUse = LshGeometryPlan.planFor(emb)
      .collect().map(_.toString).sorted.toSeq
    val readBack = LshGeometryPlan.planFor(emb)
      .collect().map(_.toString).sorted.toSeq
    assert(firstUse == inline, "store build must equal the inline pass")
    assert(readBack == inline, "store read-back must equal the inline pass")
    assert(LshGeometryPlan.geometryFromPlan(LshGeometryPlan.planFor(emb),
      "mutual").isDefined)
  }

  test("certificate is conservative against a double-precision reference") {
    // the truncating ppm folds must never EXCEED the real collision
    // probability (an optimistic certificate would un-certify nothing)
    // and must sit within 2e-3 of it (useful, not just sound)
    val tables = graft.operators.Lsh.LshTables
    def ref(b: Int, mp: Int, p: Double): Double = {
      def choose(n: Int, k: Int): Double =
        (0 until k).map(i => (n - i).toDouble / (i + 1)).product
      val pt = (0 to mp).map(i =>
        choose(b, i) * math.pow(p, b - i) * math.pow(1 - p, i)).sum
      1.0 - math.pow(1.0 - pt, tables)
    }
    for (b <- Seq(5, 8, 12, 24); mp <- 0 to 4; pPpm <- Seq(500000L, 612701L, 850000L, 995000L)) {
      val cert = LshGeometryPlan.certPpm(b, mp, pPpm)
      val r = ref(b, mp, pPpm / 1e6)
      assert(cert <= math.ceil(r * 1e6).toLong + 1,
        s"optimistic certificate at (b=$b, mp=$mp, p=$pPpm): $cert vs $r")
      // tightness only matters where certification happens — near the
      // 0.999999 floor; deep-miss arms may be loose, never optimistic
      if (r >= 0.9)
        assert(cert >= math.floor(r * 1e6).toLong - 2000,
          s"uselessly loose certificate at (b=$b, mp=$mp, p=$pPpm): $cert vs $r")
    }
  }

  test("certificate is monotone in probe width and the angle bound is valid") {
    for (b <- Seq(5, 8, 12); pPpm <- Seq(500000L, 850000L, 995000L); m <- 0 until 4)
      assert(LshGeometryPlan.certPpm(b, m + 1, pPpm) >=
        LshGeometryPlan.certPpm(b, m, pPpm))
    // p >= 1 - sqrt(1-c)/2  must LOWER-bound the true 1 - acos(c)/pi on [0,1]
    for (c <- Seq(0.0, 0.1, 0.25, 0.5, 0.7, 0.875, 0.99, 0.9999, 1.0)) {
      val bound = 1.0 - math.sqrt(1.0 - c) / 2.0
      val truth = 1.0 - math.acos(c) / math.Pi
      assert(bound <= truth + 1e-12, s"bound invalid at c=$c: $bound > $truth")
    }
  }

  test("plan frame sanity: fits, keyspace, recommendation uniqueness") {
    val emb = replicaCorpus()
    val plan = LshGeometryPlan.lshGeometryPlanQ(emb).collect()
    assert(plan.length == LshGeometryPlan.ArmBits.length)
    plan.foreach { r =>
      val bits = r.getLong(0)
      assert(r.getLong(2) == (1L << bits)) // buckets_per_table
      assert(r.getBoolean(15) == ((1L << bits) <= r.getLong(3))) // fits
    }
    assert(plan.count(_.getBoolean(16)) <= 1, "at most one mutual recommendation")
    assert(plan.count(_.getBoolean(17)) <= 1, "at most one pair recommendation")
  }
}
