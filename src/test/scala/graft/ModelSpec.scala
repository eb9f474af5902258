package graft

import graft.eval.Metrics
import graft.model.{Features, Registry, Training}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ModelSpec extends SparkSpec {
  import spark.implicits._

  private def trainFrame = {
    // learnable binary target: y = x1 + noise-ish x2 threshold
    (1 to 400).map { i =>
      val x1 = (i % 20).toDouble
      val x2 = (i % 7).toDouble
      val y = if (x1 + 0.5 * x2 > 10) 1.0 else 0.0
      (x1, x2, y)
    }.toDF("x1", "x2", "label")
  }

  test("registry resolves all 14 model names and rejects unknown") {
    (Registry.regressionModels ++ Registry.classificationModels).foreach { name =>
      assert(Registry.estimator(name) != null, name)
    }
    intercept[IllegalArgumentException](Registry.estimator("nope"))
  }

  test("t1 smoke: fit -> save -> load -> score -> AUC > 0.5 (deterministic)") {
    val df = trainFrame
    val model = Training.train(df, "label", Seq("x1", "x2"))
    val dir = Files.createTempDirectory("graft-model").toString
    Training.saveModel(model, s"$dir/lr")
    val loaded = Training.loadModel(s"$dir/lr")
    val scored = Training.score(loaded, df)
    val (auroc, aupr) = Metrics.aucMetrics(scored, "score", "label")
    assert(auroc > 0.95, s"auROC $auroc")
    assert(aupr > 0.9, s"auPR $aupr")
    // loaded model reproduces in-memory model's scores exactly
    val direct = Training.score(model, df).select("score").as[Double].collect().toSeq
    val viaDisk = scored.select("score").as[Double].collect().toSeq
    assert(direct == viaDisk)
  }

  test("score falls back to prediction for multiclass models") {
    // 3-class target: P(class 1) is not a ranking score there
    val df = (1 to 300).map { i =>
      val x1 = (i % 30).toDouble
      (x1, (i % 7).toDouble, (x1 / 10).floor)
    }.toDF("x1", "x2", "label")
    val model = Training.train(df, "label", Seq("x1", "x2"), "decision_tree_classifier")
    val scored = Training.score(model, df)
    val distinct = scored.select("score").distinct().as[Double].collect().toSet
    assert(distinct.subsetOf(Set(0.0, 1.0, 2.0)), s"multiclass score must be the class index, got $distinct")
    // binary model still scores with P(class 1): continuous values in (0,1)
    val bin = Training.score(Training.train(trainFrame, "label", Seq("x1", "x2")), trainFrame)
    val s = bin.select("score").as[Double].collect()
    assert(s.exists(v => v > 0.0 && v < 1.0))
  }

  test("generate_features_vector picks numeric non-label columns") {
    val df = Seq((1.0, 2.0, "a", 0.0)).toDF("x1", "x2", "c", "label")
    val out = Features.generateFeaturesVector(df, "label")
    assert(out.columns.contains("features"))
    val v = out.select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size == 2)
  }

  test("onehot pipeline + scaler + pca fit and persist") {
    val df = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("c", "x")
    val ohe = Features.fitOneHotPipeline(df, Seq("c"))
    assert(ohe.transform(df).columns.contains("c_ohe"))
    val assembled = Features.generateFeaturesVector(df, "none", Seq("x"))
    val scaler = Features.fitScaler(assembled, "minmax")
    assert(scaler.transform(assembled).columns.contains("features_scaled"))
    val pca = Features.fitPca(Features.generateFeaturesVector(
      Seq((1.0, 2.0), (2.0, 1.0), (3.0, 3.0)).toDF("a", "b"), "none"), 1)
    assert(pca.transform(Features.generateFeaturesVector(
      Seq((1.0, 2.0)).toDF("a", "b"), "none")).columns.contains("pca_features"))
  }

  test("lasso drives useless coefficients to zero") {
    val df = (1 to 300).map { i =>
      val x1 = (i % 20).toDouble
      val junk = 0.0 // constant column carries no signal
      (x1, junk, if (x1 > 10) 1.0 else 0.0)
    }.toDF("x1", "junk", "label")
    val dropped = Training.byLasso(df, "label", Seq("x1", "junk"), regParam = 0.05)
    assert(dropped.contains("junk"))
    assert(!dropped.contains("x1"))
  }

  test("feature importance ranks the signal feature first") {
    val df = trainFrame
    val imp = Training.featureImportance(df, "label", Seq("x1", "x2"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(imp("x1") > imp("x2"))
  }

  test("grid search returns a best model with sane AUC") {
    val cv = Training.gridSearchLogistic(trainFrame, "label", Seq("x1", "x2"),
      regParams = Seq(0.0, 0.1), elasticNetParams = Seq(0.0), numFolds = 2)
    assert(cv.avgMetrics.max > 0.9)
  }

  test("quality classifier separates held-out clean text from junk, persists") {
    import graft.text.QualityClassifier
    val clean = (0 until 60).map(i =>
      (i.toLong, s"the quiet library on elm street number $i keeps rare maps and old letters", 1.0))
    val junk = (0 until 60).map(i =>
      (i + 1000L, s"!!! ??? buy now click here spam spam winner $i !!! ???", 0.0))
    val all = (clean ++ junk).toDF("doc_id", "text", "label")
    val train = all.filter($"doc_id" % 3 =!= 0)
    val holdout = all.filter($"doc_id" % 3 === 0)
    val model = QualityClassifier.train(train, "text", "label", numFeatures = 1 << 14)
    val scored = QualityClassifier.score(holdout, model)
    // held-out accuracy at 0.5: perfect on this separable frame
    val acc = scored.agg(avg(when(($"quality_prob" >= 0.5) === ($"label" === 1.0), 1.0)
      .otherwise(0.0))).head().getDouble(0)
    assert(acc == 1.0, s"held-out accuracy $acc")
    // scoring adds quality_prob and leaves no intermediate columns behind
    assert(scored.columns.toSet === Set("doc_id", "text", "label", "quality_prob"))
    // enforcement keeps exactly the clean side
    val kept = QualityClassifier.filterByModel(holdout, model, 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.forall(_ < 1000L) && kept.nonEmpty)
    // persist -> reload -> identical scores
    val dir = Files.createTempDirectory("graft-qc").toString
    QualityClassifier.saveModel(model, dir)
    val reloaded = QualityClassifier.loadModel(dir)
    val a = scored.select("doc_id", "quality_prob").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = QualityClassifier.score(holdout, reloaded)
      .select("doc_id", "quality_prob").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }

  test("stratified CV folds keep a rare class in every training fold") {
    // 2 positives in 42 rows, 2 folds: a random split orphans the rare
    // class from one training fold with p=~0.5 (the fit then throws
    // 'rawPredictionCol vectors must have length=2'); stratified fold
    // assignment must place one positive in EACH fold, so this never fails
    val rare = ((1 to 40).map(i => ((i % 13).toDouble, 0.0)) ++
      Seq((20.0, 1.0), (21.0, 1.0))).toDF("x1", "label")
    val cv = Training.gridSearch(rare, "label", Seq("x1"),
      "logistic_regression", Map("regParam" -> Seq(0.0, 0.1)), numFolds = 2)
    assert(cv.avgMetrics.nonEmpty && cv.bestModel != null)
  }
}
