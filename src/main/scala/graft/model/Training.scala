package graft.model

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.tuning.{CrossValidator, CrossValidatorModel, ParamGridBuilder}
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train / score / persist (reference: production/training.py:23-107,
  * scoring.py:21-123, utils.py:45-57 grid search, utils.py:212-222
  * save_model).
  *
  * The whole prep + estimator chain is ONE PipelineModel, persisted with
  * the standard MLWritable layout — scoring loads it instead of refitting
  * encoders from train data (the reference refits at scoring time,
  * scoring.py:62-83; behavior-equivalent, mechanism better).
  */
object Training {

  /** Assembler + estimator pipeline, fit on train. */
  def train(
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      modelName: String = "logistic_regression"): PipelineModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
    val est = Registry.estimator(modelName, "features", labelCol)
    new Pipeline().setStages(Array(assembler, est)).fit(df)
  }

  def saveModel(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): PipelineModel = PipelineModel.load(path)

  /** Score: model.transform + positive-class probability as `score`
    * (replaces the reference's _get_label UDF chain with vector_to_array).
    *
    * P(class 1) is only meaningful as a ranking score for BINARY
    * probabilistic models — for multiclass estimators (naive_bayes, MLP)
    * element 2 of the probability vector is just one arbitrary class, and
    * one_vs_rest emits no probability column at all. Those models fall back
    * to `score` = raw prediction (the predicted class index). */
  def score(model: PipelineModel, df: DataFrame): DataFrame = {
    val scored = model.transform(df)
    val isBinaryProb = model.stages.collectFirst {
      case m: org.apache.spark.ml.classification.ProbabilisticClassificationModel[_, _] =>
        m.numClasses
    }.contains(2)
    if (isBinaryProb && scored.columns.contains("probability"))
      scored.withColumn("score", element_at(vector_to_array(col("probability")), 2))
    else scored.withColumn("score", col("prediction"))
  }

  /** Grid search with ParamGridBuilder + CrossValidator (fixes the
    * reference's never-imported ParameterGrid, utils.py:45-57). */
  def gridSearchLogistic(
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      regParams: Seq[Double] = Seq(0.0, 0.01, 0.1),
      elasticNetParams: Seq[Double] = Seq(0.0, 0.5, 1.0),
      numFolds: Int = 3): CrossValidatorModel = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features").setHandleInvalid("keep")
    val lr = new LogisticRegression().setFeaturesCol("features").setLabelCol(labelCol)
    val pipeline = new Pipeline().setStages(Array(assembler, lr))
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, regParams)
      .addGrid(lr.elasticNetParam, elasticNetParams)
      .build()
    new CrossValidator()
      .setEstimator(pipeline)
      .setEvaluator(new BinaryClassificationEvaluator().setLabelCol(labelCol))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds)
      .setParallelism(4)
      .setSeed(0L)
      .fit(df)
  }

  /** L1 (lasso) feature elimination: features whose logistic-regression
    * coefficient is driven to zero under L1 regularization
    * (reference: features.py:704-749). */
  def byLasso(
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      regParam: Double = 0.1): Seq[String] = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features").setHandleInvalid("keep")
    val lr = new LogisticRegression()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setElasticNetParam(1.0).setRegParam(regParam)
    val model = lr.fit(assembler.transform(df))
    val coefs = model.coefficients.toArray
    featureCols.zip(coefs).collect { case (c, w) if w == 0.0 => c }
  }

  /** Random-forest feature importances as a small table
    * (reference: eda.py:830-891 `feature_importance`). */
  def featureImportance(
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      numTrees: Int = 3,
      maxDepth: Int = 2): DataFrame = {
    import org.apache.spark.ml.classification.RandomForestClassifier
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features").setHandleInvalid("keep")
    val rf = new RandomForestClassifier()
      .setFeaturesCol("features").setLabelCol(labelCol)
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(0L)
    val model = rf.fit(assembler.transform(df))
    val spark = df.sparkSession
    import spark.implicits._
    featureCols.zip(model.featureImportances.toArray)
      .toDF("feature", "importance")
      .withColumn("importance", round(col("importance"), 6))
  }
}
