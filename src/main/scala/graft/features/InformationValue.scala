package graft.features

import graft.Exprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weight-of-Evidence / Information Value per feature
  * (reference: src/ta_lib/pyspark/features.py:601-702 `mi_val` — the
  * reference collects the WHOLE dataset to the driver and fans per-column
  * pandas frames back out over an RDD; here it is pure DataFrame algebra
  * that never leaves the cluster).
  *
  * Scale design: ONE percentile aggregate learns the interior bucket edges
  * for ALL features, bucket assignment is a codegen'd `when`-chain
  * projection, and a single explode + groupBy produces every
  * (feature, bucket) cell — two shuffles total regardless of feature count,
  * and no global-sort window (an unpartitioned `ntile` window would funnel
  * the dataset through one task). The explode's row multiplication
  * collapses immediately in the map-side partial aggregation.
  *
  * Per feature: bucket into q quantile buckets, count events/non-events per
  * bucket, IV = Σ (p_ne − p_e) · ln(p_ne / p_e), Laplace-smoothed (+0.5) so
  * empty cells don't produce ±∞.
  */
object InformationValue {

  /** IV of one numeric feature against a binary (0/1) target. */
  def iv(df: DataFrame, feature: String, target: String, buckets: Int = 5): Double =
    ivTable(df, Seq(feature), target, buckets).collect()(0).getDouble(1)

  /** Interior quantile edges per feature, one aggregate pass. */
  private[features] def fitEdges(
      df: DataFrame,
      features: Seq[String],
      buckets: Int,
      exact: Boolean): Map[String, Seq[Double]] = {
    val probes = (1 until buckets).map(_.toDouble / buckets)
    val aggs = features.map(f => Exprs.pctArray(col(f).cast("double"), probes, exact).as(f))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // edges are rounded to 6 decimals: percentile interpolation at heavy
    // ties differs across engines in the last ulp, which would flip rows
    // sitting exactly on an edge into a different bucket
    features.map { f =>
      val arr = Option(row.getAs[scala.collection.Seq[Any]](f))
        .map(_.toSeq.collect { case d: java.lang.Double =>
          BigDecimal(d.doubleValue()).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        })
        .getOrElse(Seq.empty)
      f -> arr
    }.toMap
  }

  /** value → bucket 1..buckets via the edge when-chain (nulls untouched). */
  private[features] def bucketOf(f: String, edges: Seq[Double], buckets: Int): Column =
    if (edges.isEmpty) lit(1)
    else {
      val first = when(col(f) <= lit(edges.head), lit(1))
      edges.tail.zipWithIndex
        .foldLeft(first) { case (acc, (e, i)) => acc.when(col(f) <= lit(e), lit(i + 2)) }
        .otherwise(lit(buckets))
    }

  /** (feature, iv) table for many features: one edge-learning pass + one
    * explode/groupBy pass over the input, however many features. */
  def ivTable(
      df: DataFrame,
      features: Seq[String],
      target: String,
      buckets: Int = 5,
      // approx by default like every other percentile-learning estimator
      // (exact `percentile` buffers a whole column per aggregation buffer —
      // executor OOM at scale, DIVERGENCES.md #7); oracle callers opt in
      exact: Boolean = false): DataFrame = {
    val edges = fitEdges(df, features, buckets, exact)
    val stacked = features.map { f =>
      struct(
        lit(f).as("feature"),
        bucketOf(f, edges(f), buckets).as("bucket"),
        col(f).isNull.as("is_null"))
    }
    val cells = df
      .select(explode(array(stacked: _*)).as("s"), col(target).cast("double").as("__y"))
      .filter(!col("s.is_null"))
      .groupBy(col("s.feature").as("feature"), col("s.bucket").as("bucket"))
      .agg(
        sum(col("__y")).as("events"),
        sum(lit(1.0) - col("__y")).as("non_events"))
    // complete the (feature × bucket) grid before the smoothed sum: the
    // +0.5·buckets denominators assume every cell exists, so a bucket
    // emptied by collapsed quantile edges must contribute its nonzero
    // smoothed term — same fix and rationale as Drift.psiTable
    val spark = df.sparkSession
    import spark.implicits._
    val grid = features
      .flatMap(f => (1 to buckets).map(b => (f, b)))
      .toDF("feature", "bucket")
    val complete = grid
      .join(cells, Seq("feature", "bucket"), "left")
      .na.fill(0.0, Seq("events", "non_events"))
    // cells is tiny (features × buckets rows) — the per-feature totals
    // window runs on the post-agg frame, partitioned by feature.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("feature")
    val pNe = (col("non_events") + 0.5) / (sum("non_events").over(w) + 0.5 * buckets)
    val pE = (col("events") + 0.5) / (sum("events").over(w) + 0.5 * buckets)
    complete
      .select(col("feature"), ((pNe - pE) * log(pNe / pE)).as("term"))
      .groupBy(col("feature"))
      .agg(round(sum(col("term")), 6).as("iv"))
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
