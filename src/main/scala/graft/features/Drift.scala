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
      .join(cellCounts(baseline, features, edges, buckets, "nb"), Seq("feature", "bucket"), "left")
      .join(cellCounts(current, features, edges, buckets, "nc"), Seq("feature", "bucket"), "left")
      .na.fill(0L, Seq("nb", "nc"))
    psiFromCells(joined, buckets)
  }

  /** (feature, bucket) → count cells of one frame under frozen edges. */
  private def cellCounts(
      df: DataFrame,
      features: Seq[String],
      edges: Map[String, Seq[Double]],
      buckets: Int,
      out: String): DataFrame = {
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

  /** Smoothed PSI over a completed (feature, bucket, nb, nc) cell frame. */
  private def psiFromCells(joined: DataFrame, buckets: Int): DataFrame = {
    val w = Window.partitionBy("feature")
    val p = (col("nb") + 0.5) / (sum("nb").over(w) + 0.5 * buckets)
    val q = (col("nc") + 0.5) / (sum("nc").over(w) + 0.5 * buckets)
    joined
      .select(col("feature"), ((p - q) * log(p / q)).as("term"))
      .groupBy(col("feature"))
      .agg(round(sum(col("term")), 6).as("psi"))
  }

  /** A drift baseline FROZEN for reuse: bucket edges plus the baseline's
    * cell counts, learned once from the training frame. The whole object
    * is features × buckets cells — kilobytes — so it ships to the driver
    * and broadcasts into every later comparison (a nightly scoring batch,
    * every micro-batch of a stream) without ever re-scanning the baseline
    * data. */
  final case class Baseline(
      features: Seq[String],
      buckets: Int,
      edges: Map[String, Seq[Double]],
      counts: Map[(String, Int), Long])

  def fitBaseline(
      baseline: DataFrame,
      features: Seq[String],
      buckets: Int = 5,
      exact: Boolean = false): Baseline = {
    require(features.nonEmpty, "no features given")
    val edges = InformationValue.fitEdges(baseline, features, buckets, exact)
    val counts = cellCounts(baseline, features, edges, buckets, "nb")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    Baseline(features, buckets, edges, counts)
  }

  /** PSI of `current` against a frozen [[Baseline]]: ONE explode+groupBy
    * over the current frame only — the baseline side is literals. Exactly
    * the arithmetic of [[psiTable]] (spec-pinned parity), shaped for
    * incremental use. */
  def psiAgainstBaseline(current: DataFrame, b: Baseline): DataFrame = {
    val spark = current.sparkSession
    import spark.implicits._
    val grid = b.features
      .flatMap(f => (1 to b.buckets).map(k => (f, k, b.counts.getOrElse((f, k), 0L))))
      .toDF("feature", "bucket", "nb")
    val joined = grid
      .join(cellCounts(current, b.features, b.edges, b.buckets, "nc"),
        Seq("feature", "bucket"), "left")
      .na.fill(0L, Seq("nc"))
    psiFromCells(joined, b.buckets)
  }
}
