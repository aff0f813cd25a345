package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-3 surfaces: raw-file CSV ingest, pivot→unpivot round-trip, and
  * ML evaluation + model persistence. */
class IngestMlSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables.events(spark, sf)

  test("csv_ingest extracts filename metadata, whitelists, and drops nulls") {
    val out = CsvIngest.csvIngest(spark, CsvIngest.FixtureDir).cache()
    // 6 files x 5 whitelisted channels x 32 samples, minus 1 empty value
    // per file; the XX channel row is whitelisted away entirely
    assert(out.count() == 6 * 5 * 32 - 6)
    assert(out.filter(col("channel") === "XX").count() == 0)
    assert(out.filter(col("value").isNull).count() == 0)
    val meta = out.select("headset", "synset", "image_id", "take", "session_id")
      .distinct().collect()
    assert(meta.length == 6, "one metadata tuple per file")
    meta.foreach { r =>
      assert(Set("Insight", "EpocX").contains(r.getAs[String]("headset")))
      assert(r.getAs[String]("synset").matches("n\\d{8}"))
      assert((40 to 45).contains(r.getAs[Int]("session_id")))
    }
    // sample_idx is per-line position; time axis = idx / 128
    val first = out.filter(col("sample_idx") === 0).select("time_sec")
      .distinct().collect()
    assert(first.map(_.getDouble(0)).toSeq == Seq(0.0))
    assert(out.agg(max("sample_idx")).head.getInt(0) == 31)
    out.unpersist()
  }

  test("csv_ingest survives a stray non-matching file: NULL metadata, no crash") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-stray")
    val fixtures = new java.io.File(CsvIngest.FixtureDir).listFiles()
    fixtures.foreach { f =>
      java.nio.file.Files.copy(f.toPath, dir.resolve(f.getName))
    }
    java.nio.file.Files.writeString(dir.resolve("not_a_drop.csv"), "AF3,1.0,2.0\n")
    val out = CsvIngest.csvIngest(spark, dir.toString).cache()
    val stray = out.filter(col("synset") === "")
    assert(stray.count() == 2, "stray file's whitelisted rows survive")
    assert(stray.filter(col("image_id").isNull && col("session_id").isNull).count() == 2,
      "stray metadata ints must be NULL, not a cast error")
    assert(out.filter(col("synset") =!= "").count() == 6 * 5 * 32 - 6)
    out.unpersist()
  }

  test("feature_unpivot round-trips the pivot: wide cell = long row") {
    val wide = SignalOps.featureWide(
      SignalOps.epochFeatures(SignalOps.silver(events))).cache()
    val long = SignalOps.featureUnpivot(wide).cache()
    val wideRows = wide.collect()
    val longMap = long.collect().map { r =>
      (r.getAs[Long]("trial_id"), r.getAs[String]("channel"),
        r.getAs[String]("feature")) -> r.getAs[Double]("avg_value")
    }.toMap
    var nonNullCells = 0
    for (r <- wideRows; ch <- SignalOps.Channels; f <- SignalOps.FeatureCols) {
      val v = r.getAs[Any](s"${ch}_${f}_avg")
      if (v != null) {
        nonNullCells += 1
        val got = longMap.get((r.getAs[Long]("trial_id"), ch, f))
        assert(got.contains(v.asInstanceOf[Double]),
          s"cell (${r.get(0)}, $ch, $f): wide=$v long=$got")
      }
    }
    assert(nonNullCells == longMap.size, "null cells must not appear in long form")
    assert(nonNullCells > 0)
    wide.unpersist(); long.unpersist()
  }

  test("ml metrics row is sane and consistent with predictions") {
    val (model, test) = MlPipeline.fitOnSplit(
      SignalOps.goldTrialStats(SignalOps.silver(events)))
    val preds = model.transform(test).cache()
    val m = MlPipeline.evalMetrics(preds).head()
    val n = m.getAs[Long]("n_test")
    assert(n == preds.count())
    val acc = m.getAs[Double]("accuracy")
    val agree = preds.filter(col("label") === col("prediction")).count()
    assert(math.abs(acc - agree.toDouble / n) < 1e-9,
      s"evaluator accuracy $acc != manual ${agree.toDouble / n}")
    Seq("f1", "weighted_precision", "weighted_recall").foreach { c =>
      val v = m.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c out of [0,1]: $v")
    }
    preds.unpersist()
  }

  test("persisted predictions round-trip: partitioned write, identical read-back") {
    val (model, test) = MlPipeline.fitOnSplit(
      SignalOps.goldTrialStats(SignalOps.silver(events)))
    val preds = model.transform(test)
    val dir = java.nio.file.Files.createTempDirectory("graft-preds-").toString
    val back = MlPipeline.persistPredictions(preds, dir)
    // partitioned layout on disk (per-class pruning)
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(parts.nonEmpty && parts.forall(_.startsWith("prediction=")), parts.mkString(","))
    // read-back equals the in-memory frame row-for-row, probability incl.
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("trial_id"), col("channel"), col("label"), col("prediction"),
          concat_ws(",", col("probability").cast("array<string>")).as("p"))
        .collect().map(_.toString).sorted
    val mem = preds.select(col("trial_id"), col("channel"), col("label"), col("prediction"),
        org.apache.spark.ml.functions.vector_to_array(col("probability")).as("probability"))
    assert(canon(back).sameElements(canon(mem)))
    // each probability row is a distribution over the label classes
    back.collect().foreach { r =>
      val p = r.getSeq[Double](r.fieldIndex("probability"))
      assert(math.abs(p.sum - 1.0) < 1e-6, s"not a distribution: $p")
    }
  }

  test("saved model reloads and predicts identically") {
    val (model, test) = MlPipeline.fitOnSplit(
      SignalOps.goldTrialStats(SignalOps.silver(events)))
    val dir = java.nio.file.Files.createTempDirectory("graft-model-").toString
    val reloaded = MlPipeline.saveAndReload(model, dir)
    def preds(m: org.apache.spark.ml.PipelineModel) =
      m.transform(test).select("trial_id", "channel", "prediction").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted
    assert(preds(reloaded).sameElements(preds(model)))
  }
}
