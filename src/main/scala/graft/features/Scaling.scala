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
    * approx sketch (exact = true only for small-SF oracle checks). */
  def fitRobust(df: DataFrame, cols: Seq[String], exact: Boolean = false): Model = {
    val aggs = cols.map(c =>
      graft.Exprs.pctArray(col(c).cast("double"), Seq(0.25, 0.5, 0.75), exact).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    Model(
      cols.map { c =>
        val arr = row.getAs[scala.collection.Seq[Double]](c)
        require(arr != null && arr.length == 3, s"Scaling.fitRobust($c): no percentiles (all-null column?)")
        c -> (arr(1), arr(2) - arr(0))
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
