package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column scaling (reference: src/ta_lib/pyspark/features.py:755-783
  * `scale_data` via MinMaxScaler/StandardScaler on an assembled vector).
  *
  * Here scaling is learned in one agg pass and applied as plain column
  * arithmetic — no vector assembly needed for the relational path (the ML
  * path still uses spark.ml scalers on the features vector; see
  * model.Registry). Keeping plain columns keeps results oracle-checkable
  * and codegen-fused.
  */
object Scaling {

  sealed trait Kind
  case object MinMax extends Kind
  case object Standard extends Kind
  case object Robust extends Kind

  final case class Model(stats: Map[String, (Double, Double)], kind: Kind, suffix: String = "_scaled") {
    def transform(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (a, b))) =>
        val scaled = kind match {
          case MinMax => // a=min, b=max
            if (b == a) lit(0.0) else (col(c) - lit(a)) / lit(b - a)
          case Standard => // a=mean, b=stddev
            if (b == 0.0) lit(0.0) else (col(c) - lit(a)) / lit(b)
          case Robust => // a=median, b=IQR
            if (b == 0.0) lit(0.0) else (col(c) - lit(a)) / lit(b)
        }
        d.withColumn(s"$c$suffix", scaled)
      }
  }

  def fitMinMax(df: DataFrame, cols: Seq[String]): Model = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"${c}__a"), max(col(c)).cast("double").as(s"${c}__b")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    Model(
      cols.map { c =>
        c -> (graft.Exprs.requireD(row, s"${c}__a", s"Scaling.fitMinMax($c)"),
        graft.Exprs.requireD(row, s"${c}__b", s"Scaling.fitMinMax($c)"))
      }.toMap,
      MinMax)
  }

  /** Robust scaling: (x − median) / IQR — insensitive to the outliers
    * that wreck min/max and mean/stddev scaling on heavy-tailed data.
    * Like every percentile-learning estimator, defaults to the mergeable
    * approx sketch (exact = true only for small-SF oracle checks).
    *
    * The learned median/IQR are quantized to `quantizeDigits` decimals
    * (inside the aggregation, with Spark's own `round`). Interpolated
    * percentiles are the one learned parameter two engines compute with
    * different floating-point association orders; publishing them at a
    * fixed decimal precision makes the fitted model reproducible across
    * engines (and keeps the DuckDB oracle in exact lockstep) at no
    * statistical cost. Pass `quantizeDigits <= 0` for raw doubles. */
  def fitRobust(
      df: DataFrame,
      cols: Seq[String],
      exact: Boolean = false,
      quantizeDigits: Int = 6): Model = {
    def q(c: org.apache.spark.sql.Column) =
      if (quantizeDigits > 0) round(c, quantizeDigits) else c
    val aggs = cols.flatMap { c =>
      // identical percentile aggregates are deduplicated by the physical
      // aggregation, so the three element_at probes share one buffer
      val arr = graft.Exprs.pctArray(col(c).cast("double"), Seq(0.25, 0.5, 0.75), exact)
      Seq(
        q(element_at(arr, 2)).as(s"${c}__m"),
        q(element_at(arr, 3) - element_at(arr, 1)).as(s"${c}__iqr"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    Model(
      cols.map { c =>
        c -> (graft.Exprs.requireD(row, s"${c}__m", s"Scaling.fitRobust($c)"),
        graft.Exprs.requireD(row, s"${c}__iqr", s"Scaling.fitRobust($c)"))
      }.toMap,
      Robust)
  }

  /** stddev is null when count < 2 — treated as 0 (constant column ⇒
    * scaled value 0.0) rather than an NPE. */
  def fitStandard(df: DataFrame, cols: Seq[String]): Model = {
    val aggs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"${c}__a"), stddev(col(c)).as(s"${c}__b")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    Model(
      cols.map { c =>
        c -> (graft.Exprs.requireD(row, s"${c}__a", s"Scaling.fitStandard($c)"),
        graft.Exprs.getD(row, s"${c}__b").getOrElse(0.0))
      }.toMap,
      Standard)
  }
}
