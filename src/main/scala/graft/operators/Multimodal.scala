package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Parity.{r, rsql}

/** Multimodal-column plumbing (SURVEY.md §2.C 34/35): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata beside
  * them. The payload here is synthesized deterministically from the
  * documents table (4-byte 'IMG0' magic + the UTF-8 text bytes) because
  * the container ships no media libraries — the Spark-side plumbing
  * (binary column, metadata schema, partition-batched decode signature)
  * is the real, tested part; the pixel decode itself is a clearly-marked
  * deterministic stand-in. Since round 8 the FORMAT-HEADER level of
  * decode is real, not stubbed: [[ImageHeaders]] (PNG IHDR + JPEG SOF
  * segment walk), [[AudioHeaders]] (RIFF/WAVE chunk walk) and
  * [[VideoHeaders]] (MP4 box walk) parse actual container bytes with
  * pure expressions — only the pixel/PCM/codec payload decode remains
  * behind the media-library boundary this stub marks.
  *
  * At 100 TB, `multimodal_meta` is a map-only projection over the binary
  * column (header peek + length arithmetic — no decode), which is exactly
  * how a real pipeline triages media before shipping bytes to decoders.
  */
object Multimodal {

  /** Opaque binary payload: 4-byte magic + encoded text. */
  def withPayload(documents: DataFrame): DataFrame =
    documents.withColumn("payload", expr("CAST(concat('IMG0', text) AS BINARY)"))

  /** Typed metadata over the encoded payload without decoding it: byte
    * size, header magic, and header-derived dimensions. */
  def multimodalMeta(documents: DataFrame): DataFrame =
    withPayload(documents)
      .withColumn("byte_len", expr("octet_length(payload)"))
      .withColumn("header_hex", expr("hex(substring(payload, 1, 4))"))
      .withColumn("width", expr("CAST(byte_len * 31 % 640 + 16 AS INT)"))
      .withColumn("height", expr("CAST(byte_len * 17 % 480 + 16 AS INT)"))
      .withColumn("aspect", expr("CAST(width AS DOUBLE) / height"))

  def multimodalMetaQ(documents: DataFrame): DataFrame =
    multimodalMeta(documents)
      .select(col("doc_id"), col("source"), col("byte_len"), col("header_hex"),
        col("width"), col("height"), r("aspect", 4))
      .orderBy("doc_id")

  val multimodalMetaSql: String =
    s"""WITH p AS (
       |  SELECT doc_id, source, text, encode('IMG0' || text) AS payload FROM documents
       |), m AS (
       |  -- DuckDB has no BLOB substring; peeking the 4-byte header goes
       |  -- through the VARCHAR prefix (ASCII magic), same bytes as Spark's
       |  -- binary substring
       |  SELECT doc_id, source,
       |         octet_length(payload) AS byte_len,
       |         hex(encode(substring('IMG0' || text, 1, 4))) AS header_hex
       |  FROM p
       |), d AS (
       |  SELECT *,
       |         CAST(byte_len * 31 % 640 + 16 AS INT) AS width,
       |         CAST(byte_len * 17 % 480 + 16 AS INT) AS height
       |  FROM m
       |)
       |SELECT doc_id, source, byte_len, header_hex, width, height,
       |       ${rsql("(CAST(width AS DOUBLE) / height)", 4, "aspect")}
       |FROM d
       |ORDER BY doc_id""".stripMargin

  /** Batch size a real vectorized decoder would be fed with. */
  val DecodeBatch = 64

  /** Partition-batched "decode": binary in, fixed-shape features out.
    * STUB: the body histogram stands in for pixel statistics — a real
    * deployment replaces only the inner loop with the media library call;
    * schema, batching and partitioning stay as tested here. */
  def multimodalDecode(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    withPayload(documents)
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatch).flatMap { batch =>
          batch.iterator.map { case (id, bytes) =>
            val body = bytes.drop(4) // past the magic
            val w = body.length % 64 + 8
            val h = body.length % 48 + 8
            val hist = new Array[Double](8)
            body.foreach(b => hist((b & 0xff) % 8) += 1.0)
            val total = math.max(body.length, 1).toDouble
            (id, w, h, body.length, hist.map(_ / total).toSeq)
          }
        }
      }
      .toDF("doc_id", "width", "height", "n_bytes", "feature")
  }

  /** Driver-facing projection: the 8-bin feature vector rides as scalar
    * columns f0…f7 (not array<double>) so a pandas-side canonicalizer can
    * sort/hash the rows — raw array columns are unhashable there. */
  def multimodalDecodeQ(documents: DataFrame): DataFrame = {
    val fs = (0 until 8).map(i =>
      expr(s"round(feature[$i] * 10000.0) / 10000.0 + 0.0").as(s"f$i"))
    multimodalDecode(documents)
      .select(col("doc_id") +: col("width") +: col("height") +: col("n_bytes") +: fs: _*)
      .orderBy("doc_id")
  }

  /** DuckDB twin of the deterministic decode stub: the payload body is
    * exactly the document's UTF-8 bytes, so the byte histogram is
    * re-computable in SQL — hex() the blob, decode each hex pair back to a
    * byte value, bin mod 8, share = count/total. The stub's role as a
    * stand-in is unchanged; what this oracles is the PLUMBING contract
    * (schema, per-doc totals, deterministic features from bytes), which is
    * exactly what survives when a real decoder replaces the histogram. */
  val multimodalDecodeSql: String = {
    val cnts = (0 until 8)
      .map(i => s"sum(CASE WHEN byte % 8 = $i THEN 1 ELSE 0 END) AS c$i")
      .mkString(",\n       |         ").stripMargin
    // greatest(n, 1) mirrors the stub's max(body.length, 1) denominator
    val hist = (0 until 8)
      .map(i => s"round(CAST(coalesce(c$i, 0) AS DOUBLE) / greatest(b.n, 1) * 10000.0) / 10000.0 + 0.0 AS f$i")
      .mkString(",\n       |       ").stripMargin
    s"""WITH b AS (
       |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
       |  FROM documents
       |), u AS (
       |  SELECT doc_id, n, unnest(range(n)) AS i, h FROM b
       |), v AS (
       |  SELECT doc_id, n,
       |         (strpos('0123456789ABCDEF', substring(h, CAST(2 * i + 1 AS INT), 1)) - 1) * 16 +
       |         (strpos('0123456789ABCDEF', substring(h, CAST(2 * i + 2 AS INT), 1)) - 1) AS byte
       |  FROM u
       |), g AS (
       |  SELECT doc_id,
       |         $cnts
       |  FROM v GROUP BY doc_id
       |)
       |-- LEFT JOIN from the per-doc base: an empty doc (n=0) unnests to zero
       |-- rows in u/g but must still emit a zero-histogram row, matching the
       |-- Spark stub which always emits one row per doc
       |SELECT b.doc_id,
       |       CAST(b.n % 64 + 8 AS INT) AS width,
       |       CAST(b.n % 48 + 8 AS INT) AS height,
       |       CAST(b.n AS INT) AS n_bytes,
       |       $hist
       |FROM b LEFT JOIN g ON g.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }
}
