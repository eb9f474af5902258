package graft.model

import org.apache.spark.ml.classification._
import org.apache.spark.ml.regression._
import org.apache.spark.ml.{Estimator, Model}

/** Estimator registry: the reference's 14 model names resolved to spark.ml
  * estimators (reference: src/ta_lib/pyspark/model_gen.py:8-75 maps name →
  * FQCN strings loaded reflectively; here the mapping is typed factories —
  * no reflection, no class-loading at runtime).
  *
  * All estimators consume a `features` vector column and a `label` column,
  * so they slot behind Features.generateFeaturesVector uniformly.
  */
object Registry {

  val regressionModels: Set[String] =
    Set("aft_survival_regression", "decision_tree_regressor", "gbt_regressor",
      "generalized_linear_regression", "isotonic_regression",
      "linear_regression", "random_forest_regressor")

  val classificationModels: Set[String] =
    Set("logistic_regression", "decision_tree_classifier", "gbt_classifier",
      "random_forest_classifier", "naive_bayes",
      "multilayer_perceptron_classifier", "one_vs_rest")

  /** name → estimator, uniformly parameterized on features/label cols.
    * `layers` only applies to the MLP (input, hidden..., classes). */
  def estimator(
      name: String,
      featuresCol: String = "features",
      labelCol: String = "label",
      mlpLayers: Array[Int] = Array.empty): Estimator[_ <: Model[_]] = name match {
    case "linear_regression" =>
      new LinearRegression().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "generalized_linear_regression" =>
      new GeneralizedLinearRegression().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "decision_tree_regressor" =>
      new DecisionTreeRegressor().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "gbt_regressor" =>
      new GBTRegressor().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "random_forest_regressor" =>
      new RandomForestRegressor().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "isotonic_regression" =>
      new IsotonicRegression().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "aft_survival_regression" =>
      new AFTSurvivalRegression().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "logistic_regression" =>
      new LogisticRegression().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "decision_tree_classifier" =>
      new DecisionTreeClassifier().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "gbt_classifier" =>
      new GBTClassifier().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "random_forest_classifier" =>
      new RandomForestClassifier().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "naive_bayes" =>
      new NaiveBayes().setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case "multilayer_perceptron_classifier" =>
      new MultilayerPerceptronClassifier()
        .setFeaturesCol(featuresCol).setLabelCol(labelCol)
        .setLayers(if (mlpLayers.nonEmpty) mlpLayers else Array(2, 4, 2))
    case "one_vs_rest" =>
      new OneVsRest()
        .setClassifier(new LogisticRegression().setFeaturesCol(featuresCol).setLabelCol(labelCol))
        .setFeaturesCol(featuresCol).setLabelCol(labelCol)
    case other =>
      throw new IllegalArgumentException(
        s"unknown model '$other'; known: ${(regressionModels ++ classificationModels).toSeq.sorted.mkString(", ")}")
  }
}
