package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weight-of-Evidence / Information Value per feature
  * (reference: src/ta_lib/pyspark/features.py:601-702 `mi_val` — the
  * reference collects the WHOLE dataset to the driver and fans per-column
  * pandas frames back out over an RDD; here it is pure DataFrame algebra
  * that never leaves the cluster).
  *
  * Per feature: ntile-bucket the feature into q quantile buckets, count
  * events/non-events per bucket, IV = Σ (p_ne − p_e) · ln(p_ne / p_e).
  * Laplace-smooth the rates so empty cells don't produce ±∞.
  */
object InformationValue {

  /** IV of one numeric feature against a binary (0/1) target. */
  def iv(df: DataFrame, feature: String, target: String, buckets: Int = 5): Double =
    ivTable(df, Seq(feature), target, buckets).collect()(0).getDouble(1)

  /** (feature, iv) table for many features. Buckets via ntile window per
    * feature; each feature is an independent shuffle but all stay
    * distributed — at scale, run features in one job each or batch by
    * persisting the input once. */
  def ivTable(df: DataFrame, features: Seq[String], target: String, buckets: Int = 5): DataFrame = {
    val perFeature = features.map { f =>
      val bucketed = df
        .select(col(f), col(target).cast("double").as("__y"))
        .filter(col(f).isNotNull)
        .withColumn("__bucket", ntile(buckets).over(Window.orderBy(col(f))))
      val cell = bucketed
        .groupBy(col("__bucket"))
        .agg(
          sum(col("__y")).as("events"),
          sum(lit(1.0) - col("__y")).as("non_events"))
      val tot = cell.agg(sum("events").as("te"), sum("non_events").as("tne"))
      cell
        .crossJoin(tot)
        .select(
          lit(f).as("feature"),
          (((col("non_events") + 0.5) / (col("tne") + 0.5 * buckets)) -
            ((col("events") + 0.5) / (col("te") + 0.5 * buckets))).as("diff"),
          log(
            ((col("non_events") + 0.5) / (col("tne") + 0.5 * buckets)) /
              ((col("events") + 0.5) / (col("te") + 0.5 * buckets))).as("woe"))
        .groupBy(col("feature"))
        .agg(round(sum(col("diff") * col("woe")), 6).as("iv"))
    }
    perFeature.reduce(_ unionByName _)
  }

  /** Drop features with IV below a threshold (weak predictors), the
    * reference's mutual-IV elimination mode (features.py:640-668). */
  def byLowIv(df: DataFrame, features: Seq[String], target: String, threshold: Double): Seq[String] =
    ivTable(df, features, target)
      .filter(col("iv") < threshold)
      .collect()
      .map(_.getString(0))
      .toSeq
}
