package graft.model

import graft.dp.Taxonomy
import org.apache.spark.ml.feature.{MinMaxScaler, OneHotEncoder, PCA, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.DataFrame

/** spark.ml feature plumbing: the features vector, vector-path encoders and
  * scalers, PCA (reference: dp.py:923-941 `generate_features_vector`,
  * features.py:108-167 onehot pipeline, features.py:755-783 `scale_data`,
  * eda.py:894-923 `feature_analysis_pca`). */
object Features {

  /** Assemble numeric columns into a `features` vector. Defaults to every
    * numeric column except the label (reference selects by taxonomy,
    * training.py:65-87). */
  def generateFeaturesVector(
      df: DataFrame,
      labelCol: String,
      cols: Seq[String] = Nil,
      outputCol: String = "features"): DataFrame = {
    val inputs =
      if (cols.nonEmpty) cols
      else Taxonomy.numericalColumns(df).filterNot(_ == labelCol)
    new VectorAssembler()
      .setInputCols(inputs.toArray)
      .setOutputCol(outputCol)
      .setHandleInvalid("keep")
      .transform(df)
  }

  /** StringIndexer + OneHotEncoder pipeline over categorical columns
    * (vector outputs `<col>_ohe`); persistable PipelineModel. */
  def fitOneHotPipeline(df: DataFrame, cols: Seq[String]): PipelineModel = {
    val stages = cols.flatMap { c =>
      Seq(
        new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx").setHandleInvalid("keep"),
        new OneHotEncoder().setInputCol(s"${c}_idx").setOutputCol(s"${c}_ohe"))
    }
    new Pipeline().setStages(stages.toArray).fit(df)
  }

  /** spark.ml scaler over an assembled vector column. */
  def fitScaler(df: DataFrame, kind: String, inputCol: String = "features", outputCol: String = "features_scaled"): PipelineModel = {
    val stage = kind match {
      case "minmax" => new MinMaxScaler().setInputCol(inputCol).setOutputCol(outputCol)
      case "standard" =>
        new StandardScaler().setInputCol(inputCol).setOutputCol(outputCol)
          .setWithMean(true).setWithStd(true)
      case other => throw new IllegalArgumentException(s"unknown scaler '$other' (minmax|standard)")
    }
    new Pipeline().setStages(Array(stage)).fit(df)
  }

  /** PCA to k components over the features vector. */
  def fitPca(df: DataFrame, k: Int, inputCol: String = "features", outputCol: String = "pca_features"): PipelineModel =
    new Pipeline()
      .setStages(Array(new PCA().setK(k).setInputCol(inputCol).setOutputCol(outputCol)))
      .fit(df)
}
