package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-drift monitoring: Population Stability Index per feature
  * between a baseline frame (training data) and a current frame
  * (yesterday's scoring batch) — the standard "has the world moved"
  * check every production scoring pipeline schedules.
  *
  * PSI = Σ_buckets (p_b − q_b) · ln(p_b / q_b), with p from the baseline,
  * q from the current frame, over buckets learned from the BASELINE's
  * quantiles only (drift must be measured against the frozen training
  * distribution, not re-fit on the drifted data). Laplace-smoothed
  * (+0.5 per cell) so a bucket emptied by drift scores finite. Common
  * reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25 act.
  *
  * Scale shape (inherited from the IV machinery): one percentile pass on
  * the baseline learns edges for ALL features, bucket assignment is a
  * codegen'd when-chain, each frame contributes one explode + groupBy
  * (map-side combined), and the PSI arithmetic runs on the tiny
  * (features × buckets) cell frame.
  */
object Drift {

  def psiTable(
      baseline: DataFrame,
      current: DataFrame,
      features: Seq[String],
      buckets: Int = 5,
      exact: Boolean = false): DataFrame = {
    require(features.nonEmpty, "no features given")
    val edges = InformationValue.fitEdges(baseline, features, buckets, exact)

    def cells(df: DataFrame, out: String): DataFrame = {
      val stacked = features.map { f =>
        struct(
          lit(f).as("feature"),
          InformationValue.bucketOf(f, edges(f), buckets).as("bucket"),
          col(f).isNull.as("is_null"))
      }
      df.select(explode(array(stacked: _*)).as("s"))
        .filter(!col("s.is_null"))
        .groupBy(col("s.feature").as("feature"), col("s.bucket").as("bucket"))
        .agg(count(lit(1)).as(out))
    }

    // complete the (feature × bucket) grid before joining counts: a bucket
    // empty in BOTH frames (collapsed quantile edges on skewed features)
    // still carries a smoothed term — the +0.5·buckets denominators assume
    // every cell exists, so dropping absent cells would bias PSI exactly
    // on degenerate features
    val spark = baseline.sparkSession
    import spark.implicits._
    val grid = features
      .flatMap(f => (1 to buckets).map(b => (f, b)))
      .toDF("feature", "bucket")
    val joined = grid
      .join(cells(baseline, "nb"), Seq("feature", "bucket"), "left")
      .join(cells(current, "nc"), Seq("feature", "bucket"), "left")
      .na.fill(0L, Seq("nb", "nc"))
    val w = Window.partitionBy("feature")
    val p = (col("nb") + 0.5) / (sum("nb").over(w) + 0.5 * buckets)
    val q = (col("nc") + 0.5) / (sum("nc").over(w) + 0.5 * buckets)
    joined
      .select(col("feature"), ((p - q) * log(p / q)).as("term"))
      .groupBy(col("feature"))
      .agg(round(sum(col("term")), 6).as("psi"))
  }
}
