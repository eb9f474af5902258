package graft.text

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the fastText-style classifier
  * step of the published LLM data pipelines (GPT-3 / LLaMA / CCNet lineage:
  * train a cheap linear classifier on "reference corpus vs raw crawl"
  * labels, keep documents it scores as reference-like). The rule-based
  * [[TextAnalysis.qualityScore]] gate is the first-pass heuristic; this is
  * the learned second pass that catches fluent-looking junk the rules
  * admit.
  *
  * Architecture: whitespace tokenization → feature hashing → logistic
  * regression, all spark.ml, persisted as ONE PipelineModel.
  * HashingTF is the deliberate scale choice: it has NO vocabulary fit —
  * no corpus-sized dictionary shuffle, no driver-held vocab — so
  * featurization is a stateless single pass at any corpus size, and
  * scoring a 100 TB corpus is embarrassingly parallel (broadcast model,
  * one map pass). Training only needs the LABELED frame (reference +
  * sampled crawl), which is orders of magnitude smaller than the corpus
  * being filtered.
  */
object QualityClassifier {

  /** Train on a labeled frame: `labelCol` is 1.0 for reference-quality
    * documents, 0.0 for junk. `numFeatures` is the hash width (collisions
    * trade accuracy for memory; 2^18 is ample for a linear gate). */
  def train(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      numFeatures: Int = 1 << 18,
      maxIter: Int = 50,
      regParam: Double = 1e-4): PipelineModel = {
    require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__qc_tokens")
      .setPattern("\\s+") // split on whitespace: same token stream as TextAnalysis.tokens
    val tf = new HashingTF()
      .setInputCol("__qc_tokens").setOutputCol("__qc_features")
      .setNumFeatures(numFeatures)
    val lr = new LogisticRegression()
      .setFeaturesCol("__qc_features").setLabelCol(labelCol)
      .setPredictionCol("__qc_pred")
      .setProbabilityCol("__qc_prob")
      .setRawPredictionCol("__qc_raw")
      .setMaxIter(maxIter).setRegParam(regParam)
    new Pipeline().setStages(Array(tok, tf, lr)).fit(df)
  }

  /** Score a corpus: adds `quality_prob` (P(reference-like)) and drops the
    * intermediate token/feature columns — a pure map pass over the corpus
    * with the broadcast model. */
  def score(df: DataFrame, model: PipelineModel): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(df)
      .withColumn("quality_prob",
        round(element_at(vector_to_array(col("__qc_prob")), 2), 6))
      .drop("__qc_tokens", "__qc_features", "__qc_raw", "__qc_prob", "__qc_pred")
  }

  /** Enforcement: keep documents scoring at least `minProb`. */
  def filterByModel(
      df: DataFrame, model: PipelineModel, minProb: Double): DataFrame = {
    require(minProb >= 0 && minProb <= 1, s"minProb must be in [0,1], got $minProb")
    score(df, model).filter(col("quality_prob") >= minProb)
  }

  def saveModel(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): PipelineModel = PipelineModel.load(path)
}
