package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw-file CSV ingest — the reference's actual bronze entry point
  * (/root/reference/delta_bronze.py:17,40-78 and
  * /root/reference/main/combine_files.py:46-75): headerless CSV text where
  * each line is `channel,v0,v1,...`, with trial metadata encoded in the
  * FILENAME (`MindBigData_Imagenet_<headset>_<synset>_<image>_<take>_
  * <session>.csv`).
  *
  * Shape: read as TEXT → `input_file_name()` + `regexp_extract` on the path
  * for metadata → `split` line → head = channel, tail = samples →
  * `posexplode` to long rows (sample_idx, value) → cast, channel whitelist,
  * dropna → `time_sec = sample_idx / FS`.
  *
  * Scale (100 TB of raw drops): the whole ingest is MAP-ONLY — no shuffle,
  * no window. Files are the parallelism unit (text source splits by file /
  * block), path-regex metadata is evaluated per partition, and posexplode
  * pipelines inside the same stage, so 1000 executors ingest independent
  * file sets with zero coordination. A partitioned write (reference:
  * partitionBy synset, ingest_date) follows directly; incremental skip-if-
  * exists is the left-anti `incremental_new_keys` operator applied to the
  * filename set.
  *
  * Oracle parity: value text → double is IEEE-exact in both engines;
  * time_sec = idx/128 is exact (power-of-two divisor); `try_cast` twins
  * DuckDB's TRY_CAST for the dropna semantics (empty field → NULL → drop).
  * The fixture CSVs (fixtures/eeg_csv, committed, deterministic) include a
  * non-whitelisted channel row and an empty value per file so both clean
  * steps are actually exercised.
  */
object CsvIngest {

  /** Committed fixture dir — the staged "raw drop" both engines read. */
  val FixtureDir = "/root/repo/fixtures/eeg_csv"

  /** Same capture groups as the reference's FNAME_RE
    * (combine_files.py:46-53); anchored on the path tail so Spark's
    * file:// URI and DuckDB's plain path both match. */
  val FnameRe = ".*MindBigData_Imagenet_([^_/]+)_(n\\d{8})_(\\d+)_(\\d+)_(\\d+)\\.csv$"

  /** EXPECTED_CHANNELS (delta_bronze.py:14). */
  val ExpectedChannels: Seq[String] = Seq("AF3", "AF4", "T7", "T8", "Pz")

  val FS = 128.0

  def csvIngest(spark: SparkSession, dir: String): DataFrame = {
    val src = input_file_name()
    // guard the cast: a file whose name misses the pattern yields NULL
    // metadata (regexp_extract gives "" there) instead of an ANSI cast
    // error — an unexpected drop must not kill the whole ingest
    def metaInt(group: Int): org.apache.spark.sql.Column = {
      val g = regexp_extract(src, FnameRe, group)
      when(g =!= "", g.cast("int"))
    }
    spark.read.text(s"$dir/*.csv")
      .select(
        regexp_extract(src, FnameRe, 1).as("headset"),
        regexp_extract(src, FnameRe, 2).as("synset"),
        metaInt(3).as("image_id"),
        metaInt(4).as("take"),
        metaInt(5).as("session_id"),
        split(col("value"), ",").as("parts"))
      // the samples slice stays INLINE in the generator (not a named
      // `samples` column): a named column gets InferFiltersFromGenerate's
      // size>0/isnotnull filter with the slice inlined — two extra array
      // copies per line at the scan (same pathology as Dedup.shingleExploded,
      // milder: `parts` itself is multi-referenced so split stays shared)
      .selectExpr("headset", "synset", "image_id", "take", "session_id",
        "parts[0] AS channel",
        "posexplode(slice(parts, 2, size(parts) - 1)) AS (sample_idx, value_str)")
      .select(col("headset"), col("synset"), col("image_id"), col("take"),
        col("session_id"), col("channel"), col("sample_idx"),
        (col("sample_idx") / lit(FS)).as("time_sec"),
        expr("try_cast(value_str AS DOUBLE)").as("value"))
      .filter(col("channel").isin(ExpectedChannels: _*) && col("value").isNotNull)
  }

  // full metadata key in the ORDER BY: (synset, channel, sample_idx) is
  // unique only while every fixture file has a distinct synset — a second
  // take/session of the same synset would silently break the deterministic-
  // order invariant, so include every filename-derived key as tie-break
  def csvIngestQ(spark: SparkSession): DataFrame =
    csvIngest(spark, FixtureDir)
      .orderBy("synset", "headset", "image_id", "take", "session_id",
        "channel", "sample_idx")

  val csvIngestSql: String = {
    val chans = ExpectedChannels.map(c => s"'$c'").mkString(", ")
    s"""WITH f AS (
       |  SELECT filename, content FROM read_text('$FixtureDir/*.csv')
       |), l AS (
       |  SELECT regexp_extract(filename, '$FnameRe', 1) AS headset,
       |         regexp_extract(filename, '$FnameRe', 2) AS synset,
       |         CAST(regexp_extract(filename, '$FnameRe', 3) AS INT) AS image_id,
       |         CAST(regexp_extract(filename, '$FnameRe', 4) AS INT) AS take,
       |         CAST(regexp_extract(filename, '$FnameRe', 5) AS INT) AS session_id,
       |         unnest(string_split(content, chr(10))) AS line
       |  FROM f
       |), p AS (
       |  SELECT * EXCLUDE (line), string_split(line, ',') AS parts
       |  FROM l WHERE length(trim(line)) > 0
       |), s AS (
       |  SELECT headset, synset, image_id, take, session_id,
       |         parts[1] AS channel,
       |         CAST(unnest(range(len(parts) - 1)) AS INT) AS sample_idx,
       |         unnest(parts[2:]) AS value_str
       |  FROM p
       |)
       |SELECT headset, synset, image_id, take, session_id, channel, sample_idx,
       |       sample_idx / $FS AS time_sec,
       |       TRY_CAST(value_str AS DOUBLE) AS value
       |FROM s
       |WHERE channel IN ($chans) AND TRY_CAST(value_str AS DOUBLE) IS NOT NULL
       |ORDER BY synset, headset, image_id, take, session_id, channel, sample_idx""".stripMargin
  }
}
