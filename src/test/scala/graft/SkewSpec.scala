package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Skew}

class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals plain join on a skewed key distribution") {
    import spark.implicits._
    // 90% of left rows share one key — the classic hot-key shape
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "v")
    val right = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k"))
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(left, right, "k", salt = 8)
      .collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salted agg equals plain agg for sum/count merge") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i % 20 == 0) i.toLong % 5 else 7L, i.toDouble))
      .toDF("k", "x")
    val plain = df.groupBy("k")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val salted = Skew.saltedAgg(df, "k", salt = 8,
      partials = Seq(sum("x").as("ps"), count(lit(1)).as("pn")),
      finals = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(salted.map(t => (t._1, t._3)).sameElements(plain.map(t => (t._1, t._3))))
    salted.zip(plain).foreach { case (s, p) => assert(math.abs(s._2 - p._2) < 1e-6) }
  }

  test("AQE-off: salted join spreads the hot key over reducers (plain plan can't)") {
    import spark.implicits._
    // AQE's skew split is the usual safety net; salting is for where AQE
    // can't re-plan. Force that world: AQE off, broadcast off, so the plain
    // join shuffles both sides on k and the hot key lands on ONE reducer.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = (1 to 20000).map(i => (if (i % 100 == 0) i.toLong else 42L, i))
        .toDF("k", "v") // 99% of rows share k=42
      val right = (0L to 60L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val plain = left.join(right, Seq("k"))
      val salted = Skew.saltedJoin(left, right, "k", salt = 16)
      // identical results…
      assert(salted.count() == plain.count())
      // …but the per-reducer row histogram flattens: the plain plan puts
      // every k=42 row in one partition; the salted plan spreads them over
      // the (k, _salt) space
      def histo(df: org.apache.spark.sql.DataFrame): Array[Int] =
        df.rdd.mapPartitions(it => Iterator(it.length)).collect()
      val hp = histo(plain)
      val hs = histo(salted)
      assert(hp.max >= 19000, s"expected one hot reducer, max=${hp.max} of ${hp.sum}")
      assert(hs.max <= hp.max / 2,
        s"salting did not spread: salted max=${hs.max} vs plain max=${hp.max}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }

  test("ngram-jaccard with salted candidate join is row-identical to unsalted") {
    // the shipped operator option: dense shingles make the candidate join
    // hot-keyed; salting must change only the exchange layout, not the pairs
    val docs = Tables.documents(spark, sf)
    val plain = Dedup.ngramJaccardPairs(docs)
      .select("id1", "id2", "inter", "n1", "n2")
      .collect().map(_.toString).sorted
    val salted = Dedup.ngramJaccardPairs(docs, saltCandidates = Some(8))
      .select("id1", "id2", "inter", "n1", "n2")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain),
      s"salted=${salted.length} plain=${plain.length}")
  }

  test("hot-key-only salted join equals plain join; cold keys skip salting") {
    import spark.implicits._
    // one key (42) holds most of both sides — the only one worth salting
    val left = (1 to 3000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "v")
    val right = (1 to 600).map(i => (if (i % 3 == 0) i.toLong % 7 else 42L, s"r$i"))
      .toDF("k", "name")
    val hot = Seq(42L).toDF("k")
    val plain = left.join(right, Seq("k")).collect().map(_.toString).sorted
    val salted = Skew.saltedJoinHot(left, right, "k", salt = 8, hotKeys = hot)
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain), s"salted=${salted.length} plain=${plain.length}")
    // empty hot set degrades to exactly the plain join, row-for-row
    val noneHot = Skew.saltedJoinHot(left, right, "k", salt = 8,
      hotKeys = Seq.empty[Long].toDF("k")).collect().map(_.toString).sorted
    assert(noneHot.sameElements(plain))
  }

  test("hotShingles flags exactly the keys above both the mean share and the floor") {
    import spark.implicits._
    // key 1: df=100 (df²=10000 dominates Σ df²); keys 2..51: df=2 each
    val ex = ((1 to 100).map(_ => 1L) ++ (2L to 51L).flatMap(k => Seq(k, k)))
      .map(sh => (sh, sh)).toDF("doc_id", "sh")
    val hot = Dedup.hotShingles(ex, parts = 8, dfFloor = 10L)
      .collect().map(_.getLong(0)).toSet
    assert(hot == Set(1L), s"hot=$hot")
    // floor above the hot key's df → nothing qualifies, whatever its share
    val none = Dedup.hotShingles(ex, parts = 8, dfFloor = 1000L).count()
    assert(none == 0L)
  }

  test("CC with salted neighbor-min is label-identical to unsalted") {
    import spark.implicits._
    // hub graph: vertex 0 touches every other vertex, so every CC round's
    // neighbor-min funnels all of 0's edges to one key — the shape
    // saltNeighborMin exists for. Plus a disjoint chain to prove salting
    // does not leak labels across components.
    val hub = (1L to 200L).map(v => (0L, v))
    val chain = (500L until 540L).map(v => (v, v + 1))
    val pairs = (hub ++ chain).toDF("id1", "id2")
    val vertices = ((0L to 200L) ++ (500L to 540L)).toDF("doc_id")
    val edges = pairs.unionAll(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
    def labels(salt: Option[Int]) =
      Dedup.propagateMinLabels(vertices, edges, maxIters = 20, saltNeighborMin = salt)
        ._1.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val plain = labels(None)
    val salted = labels(Some(8))
    assert(salted.sameElements(plain))
    assert(plain.filter(_._1 <= 200L).forall(_._2 == 0L))
    assert(plain.filter(_._1 >= 500L).forall(_._2 == 500L))
  }

  test("salting actually spreads the hot key across subkeys") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (42L, i)).toDF("k", "v")
    val salts = left.withColumn("_salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"hot key occupied only $salts subkeys of 8")
  }
}
