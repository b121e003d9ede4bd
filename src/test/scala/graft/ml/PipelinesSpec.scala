package graft.ml

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ml.Pipelines.RegressionConfig

class PipelinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = (1 to 200).map { i =>
    val cat = if (i % 3 == 0) "a" else "b"
    (i.toDouble % 24, cat, (i % 24) * 2.0 + (if (cat == "a") 5.0 else 0.0))
  }.toDF("hour", "kind", "y")

  private val cfg = RegressionConfig(
    label = "y", numericCols = Seq("hour"), categoricalCols = Seq("kind"),
    maxIter = 5, numTrees = 5)

  test("M1-M7 GBT pipeline fits, scores, and keeps unseen categories (handleInvalid=keep)") {
    val model = Pipelines.regression(frame, cfg).fit(frame)
    val scored = model.transform(frame)
    assert(scored.columns.contains("prediction"))
    // unseen category at scoring time must not fail
    val unseen = Seq((3.0, "zz", 0.0)).toDF("hour", "kind", "y")
    assert(model.transform(unseen).count() == 1)
  }

  test("M5 RandomForest variant trains") {
    val model = Pipelines.regression(frame, cfg.copy(algo = "rf")).fit(frame)
    assert(model.transform(frame).count() == 200)
  }

  test("M8 evaluate returns finite rmse/mae/r2 and learns the linear signal") {
    val model = Pipelines.regression(frame, cfg).fit(frame)
    val m = Pipelines.evaluate(model.transform(frame), "y")
    assert(m.rmse >= 0 && !m.rmse.isNaN)
    assert(m.r2 > 0.8) // y is a clean function of the features
  }

  test("M9 save/load round trip preserves predictions") {
    val model = Pipelines.regression(frame, cfg).fit(frame)
    val path = Files.createTempDirectory("model").toString + "/m"
    Pipelines.save(model, path)
    val back = Pipelines.load(path)
    val a = model.transform(frame).agg(sum("prediction")).head.getDouble(0)
    val b = back.transform(frame).agg(sum("prediction")).head.getDouble(0)
    assert(a == b)
  }

  test("M6 column-presence filtering drops absent feature columns") {
    val noCat = frame.drop("kind")
    val model = Pipelines.regression(noCat, cfg).fit(noCat)
    assert(model.transform(noCat).count() == 200)
  }
}
