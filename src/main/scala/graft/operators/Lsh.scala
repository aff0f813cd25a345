package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-quadratic near-duplicate and ANN operators (SURVEY.md §2.C 29/30/32)
  * — the 100 TB paths that replace the exact all-pairs forms in
  * [[Dedup]]/[[Similarity]]. All three follow the same scale shape:
  * per-item signature (map-only) → explode banded keys → hash self-join on
  * the band key → verify candidates exactly. Cost is Σ bucket² over
  * buckets, never n² over items.
  *
  * These are rows-only operators (signatures are engine-specific hashes, so
  * there is no DuckDB twin); their correctness gates are the specs, which
  * check recall against the exact operators on the same data.
  */
object Lsh {

  // --------------------------------------------------------- minhash + LSH

  /** MinHash geometry: K hash functions in B bands of R rows. For Jaccard
    * j=0.8 candidates: P(candidate) = 1-(1-j^4)^8 ≈ 0.986; the planted
    * near-dups here sit at j≈0.98 where recall is 1-1e-11. */
  val MinhashK = 32
  val MinhashBands = 8
  val MinhashRows = 4

  /** Per-doc MinHash signature: sig[j] = min over shingles of
    * xxhash64(j, shingle) — one seeded hash family, no stored permutations. */
  def minhashSignatures(documents: DataFrame): DataFrame =
    Dedup.shingleSets(documents)
      .withColumn("sig", expr(
        s"transform(sequence(0, ${MinhashK - 1}), j -> array_min(transform(shingles, s -> xxhash64(j, s))))"))

  /** Banded-LSH candidate pairs, verified with exact Jaccard ≥ τ. */
  def minhashLshPairs(documents: DataFrame,
                      threshold: Double = Dedup.JaccardThreshold): DataFrame = {
    val sigs = minhashSignatures(documents)
    val bandCols = (0 until MinhashRows).map(i => s"sig[b * $MinhashRows + $i]").mkString(", ")
    val buckets = sigs
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, ${MinhashBands - 1}), b -> xxhash64(b, $bandCols))"))
          .as("bkey"))
    val cand = buckets.as("a")
      .join(buckets.as("b"), col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    // exact verification; at corpus scale this join ships only candidate
    // shingle sets (|candidates| << n²)
    val sh = Dedup.shingleSets(documents)
    cand
      .join(sh.select(col("doc_id").as("id1"), col("shingles").as("sh1"), col("nsh").as("n1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("shingles").as("sh2"), col("nsh").as("n2")), "id2")
      .withColumn("inter", expr("size(array_intersect(sh1, sh2))"))
      .withColumn("jaccard", expr("CAST(inter AS DOUBLE) / (n1 + n2 - inter)"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("inter"), Parity.r("jaccard", 4))
  }

  def minhashLshQ(documents: DataFrame): DataFrame =
    minhashLshPairs(documents).orderBy("id1", "id2")

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash from shingle hashes: bit i is set when the sum of
    * ±1 contributions of bit i across shingle hashes is positive. Bits are
    * OR-combined (never summed) so no overflow. At corpus scale the
    * per-bit recomputation of xxhash64 would move to an explode+agg; at
    * document granularity the fused per-row expression keeps it map-only. */
  def simhashes(documents: DataFrame): DataFrame =
    Dedup.shingleSets(documents)
      .withColumn("hs", expr("transform(shingles, s -> xxhash64(s))")) // hash once per shingle
      .withColumn("simhash", expr(
        """aggregate(
          |  transform(sequence(0, 63), i ->
          |    CASE WHEN aggregate(hs, 0L,
          |           (acc, h) -> acc + (CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1 ELSE -1 END)) > 0
          |         THEN shiftleft(1L, i) ELSE 0L END),
          |  0L, (a, b) -> a | b)""".stripMargin))

  val SimhashBands = 4
  val MaxHamming = 3

  /** Hamming ≤ 3 pairs via 4×16-bit band partition: ≤3 differing bits
    * cannot touch all 4 bands, so one band always matches — recall is
    * exactly 1 (pigeonhole), no probabilistic miss. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = MaxHamming): DataFrame = {
    val hs = simhashes(documents).select("doc_id", "simhash")
    val buckets = hs.select(col("doc_id"), col("simhash"),
      explode(expr(s"transform(sequence(0, ${SimhashBands - 1}), b -> " +
        "named_struct('band', b, 'key', shiftright(simhash, b * 16) & 65535))")).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.simhash").as("h1"), col("b.simhash").as("h2"))
      .distinct()
      .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  def simhashQ(documents: DataFrame): DataFrame =
    simhashPairs(documents).orderBy("id1", "id2")

  // -------------------------------------------------- hyperplane LSH kNN

  /** L tables × NBits random hyperplanes, fixed seed. */
  val LshTables = 8
  val LshBits = 5
  val LshSeed = 42

  /** Deterministic hyperplanes: LshTables*LshBits planes × 64 dims. */
  lazy val Planes: IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new scala.util.Random(LshSeed)
    IndexedSeq.fill(LshTables * LshBits)(IndexedSeq.fill(64)(rnd.nextGaussian()))
  }

  private lazy val planesSql: String =
    Planes.map(p => s"array(${p.mkString(", ")})").mkString("array(", ", ", ")")

  /** vec → L bucket keys (sign pattern of NBits plane dots per table). */
  def lshBuckets(embeddings: DataFrame): DataFrame =
    Similarity.withNorm(embeddings)
      .withColumn("planes", expr(planesSql))
      .withColumn("bucket", expr(
        s"""transform(sequence(0, ${LshTables - 1}), t ->
           |  named_struct('t', t, 'key',
           |    aggregate(sequence(0, ${LshBits - 1}), 0L, (acc, p) ->
           |      acc | (CASE WHEN graft_dot(vd, planes[t * $LshBits + p]) > 0.0
           |                  THEN shiftleft(1L, p) ELSE 0L END))))""".stripMargin))
      .select(col("vec_id"), col("label"), col("vd"), col("norm"),
        explode(col("bucket")).as("bk"))
      .select(col("vec_id"), col("label"), col("vd"), col("norm"),
        col("bk.t").as("t"), col("bk.key").as("key"))

  /** ANN top-k: bucket-join candidates (same table, same key), exact
    * cosine rerank within candidates. The scale path: the join touches
    * Σ bucket² pairs instead of |Q|·n. */
  def knnCosineLsh(embeddings: DataFrame, k: Int = Similarity.KnnK): DataFrame = {
    val b = lshBuckets(embeddings)
    val qb = b.filter(col("vec_id") % Similarity.QueryMod === 0)
      .select(col("vec_id").as("query_id"), col("vd").as("qv"), col("norm").as("qn"),
        col("t"), col("key"))
    val cand = b.join(qb, Seq("t", "key"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "label", "vd", "norm", "qv", "qn")
      .dropDuplicates("query_id", "vec_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    cand
      .withColumn("cos", expr(s"${Similarity.DotF} / (norm * qn)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        Parity.r("cos", 4), col("label"))
  }

  def knnCosineLshQ(embeddings: DataFrame): DataFrame =
    knnCosineLsh(embeddings).orderBy("query_id", "rank")
}
