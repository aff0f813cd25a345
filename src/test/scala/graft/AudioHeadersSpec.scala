package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AudioHeaders

/** RIFF/WAVE chunk-walk decode over the committed fixtures: known PCM
  * parameters, the LIST-payload `fmt ` trap, odd-chunk padding, the
  * non-RIFF path, truncation robustness, and the map-only plan.
  */
class AudioHeadersSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val out = AudioHeaders.audioHeaderDecode(spark).collect()
    .map { r =>
      r.getString(0) -> (r.getString(1),
        Option(r.getAs[Integer]("n_channels")).map(_.toInt),
        Option(r.getAs[java.lang.Long]("sample_rate")).map(_.toInt),
        Option(r.getAs[Integer]("bits_per_sample")).map(_.toInt),
        Option(r.getAs[java.lang.Long]("data_bytes")).map(_.toInt),
        Option(r.getAs[java.lang.Double]("duration_sec")).map(_.toDouble))
    }.toMap

  test("PCM fmt fields decode across widths/rates; duration from data size") {
    assert(out("pcm16_stereo_44100.wav") ==
      (("wav", Some(2), Some(44100), Some(16), Some(441 * 4), Some(0.01))))
    assert(out("pcm24_mono_48000.wav") ==
      (("wav", Some(1), Some(48000), Some(24), Some(48 * 3), Some(0.001))))
    // pcm8 carries an ODD-sized LIST chunk before fmt — the walker must
    // hop 8 + size + the pad byte to land on the real fmt chunk
    assert(out("pcm8_mono_8000.wav") ==
      (("wav", Some(1), Some(8000), Some(8), Some(80), Some(0.01))))
  }

  test("LIST-payload 'fmt ' trap: only chunk hopping finds the real fmt chunk") {
    // the LIST chunk payload contains the bytes 'fmt ' followed by a bogus
    // (channels=9, rate=1, bits=9) block — a first-occurrence scan reads
    // that garbage; the walker must report the true 22050/2/16
    assert(out("listtrap_22050.wav") ==
      (("wav", Some(2), Some(22050), Some(16), Some(220 * 4),
        Some(220 * 4 * 8.0 / (22050 * 2 * 16)))))
  }

  test("non-RIFF bytes: unknown format, NULL fields; truncated WAV never throws") {
    assert(out("notaudio.bin") == (("unknown", None, None, None, None, None)))
    import spark.implicits._
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${AudioHeaders.FixtureDir}/pcm16_stereo_44100.wav"))
    val rows = Seq(
      ("trunc_mid_fmt", full.take(16)),  // RIFF/WAVE intact, fmt chunk cut
      ("trunc_sig", full.take(6)))
      .toDF("file", "content")
      .selectExpr("file", "content", "CAST(octet_length(content) AS BIGINT) AS byte_len")
    val got = AudioHeaders.decodeAudioHeaders(rows).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.isNullAt(4) && r.isNullAt(5))).toMap
    assert(got("trunc_mid_fmt") == (("wav", true)), "truncated wav: NULL fields")
    assert(got("trunc_sig")._1 == "unknown")
  }

  test("plan shape: map-only — zero exchanges over the binary scan") {
    val p = AudioHeaders.audioHeaderDecode(spark).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"audio header decode must not shuffle:\n$p")
  }
}
