package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chi-square test of independence per categorical feature against a
  * categorical target — the categorical twin of the IV table for feature
  * screening (drop features whose distribution is independent of the
  * label).
  *
  * Scale shape: one explode + groupBy builds every (feature, value,
  * class) contingency cell for ALL features in a single pass (map-side
  * combined); expected counts and the chi-square sum run as windows over
  * the tiny cell frame (bounded by category cardinality × classes, never
  * raw data). Rows with a null feature value are excluded per feature.
  */
object ChiSquare {

  /** (feature, chi2, dof) per feature; dof = (|values|−1)·(|classes|−1). */
  def chiSquareTable(df: DataFrame, features: Seq[String], target: String): DataFrame = {
    require(features.nonEmpty, "no features given")
    val stacked = features.map { f =>
      struct(
        lit(f).as("feature"),
        col(f).cast("string").as("v"),
        col(target).cast("string").as("y"),
        col(f).isNull.as("is_null"))
    }
    val observed = df
      .select(explode(array(stacked: _*)).as("s"))
      .filter(!col("s.is_null"))
      .groupBy(col("s.feature").as("feature"), col("s.v").as("v"), col("s.y").as("y"))
      .agg(count(lit(1)).as("o"))
    // complete the contingency grid: a (value, class) combination that
    // never co-occurs still contributes (0 − e)²/e = e to the statistic —
    // dropping it understates chi2 exactly when association is strongest
    val cells = observed.select(col("feature"), col("v")).distinct()
      .join(observed.select(col("feature"), col("y")).distinct(), Seq("feature"))
      .join(observed, Seq("feature", "v", "y"), "left")
      .na.fill(0L, Seq("o"))
    val wv = Window.partitionBy("feature", "v")
    val wy = Window.partitionBy("feature", "y")
    val wf = Window.partitionBy("feature")
    val e = sum("o").over(wv) * sum("o").over(wy) / sum("o").over(wf).cast("double")
    cells
      .select(col("feature"), col("v"), col("y"), col("o"), e.as("e"))
      .select(col("feature"), col("v"), col("y"),
        ((col("o") - col("e")) * (col("o") - col("e")) / col("e")).as("term"))
      .groupBy(col("feature"))
      .agg(
        round(sum(col("term")), 6).as("chi2"),
        ((count_distinct(col("v")) - 1) * (count_distinct(col("y")) - 1))
          .cast("int").as("dof"))
  }
}
