package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlier bounds learned on train, applied lazily on any frame
  * (reference: src/ta_lib/pyspark/dp.py:317-558 `Outlier_Treatment`).
  *
  * fit = one wide agg over all columns (the reference runs approxQuantile
  * per column); transform = pure `when`/`filter` expressions, so capping of
  * 50 columns is still a single codegen'd projection at 100 TB.
  */
object OutlierTreatment {

  sealed trait Method
  /** q1/q3 ∓ 1.5·IQR (reference: dp.py:357-390). */
  case object Iqr extends Method
  /** mean ∓ 3σ (reference: dp.py:393-424). */
  case object Sdv extends Method

  final case class Bounds(lower: Double, upper: Double)
  final case class Model(bounds: Map[String, Bounds]) {

    /** Cap values outside bounds to the bound (reference: dp.py:498-511). */
    def cap(df: DataFrame): DataFrame =
      bounds.foldLeft(df) { case (d, (c, b)) =>
        d.withColumn(
          c,
          when(col(c) < b.lower, lit(b.lower))
            .when(col(c) > b.upper, lit(b.upper))
            .otherwise(col(c)))
      }

    /** Drop rows with any value outside bounds (reference: dp.py:468-495). */
    def drop(df: DataFrame): DataFrame = {
      val keep = bounds
        .map { case (c, b) => col(c).isNull || (col(c) >= b.lower && col(c) <= b.upper) }
        .reduce(_ && _)
      df.filter(keep)
    }

    /** Long-format bounds table for inspection / persistence. */
    def boundsTable(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      bounds.toSeq
        .sortBy(_._1)
        .map { case (c, b) => (c, b.lower, b.upper) }
        .toDF("column", "lower_bound", "upper_bound")
    }
  }

  /** Learn per-column bounds in ONE aggregate pass. Percentiles default to
    * the mergeable approx sketch; `exact = true` opts into exact mode for
    * oracle checks (see graft.Exprs). */
  def fit(
      df: DataFrame,
      cols: Seq[String],
      method: Method = Iqr,
      iqrK: Double = 1.5,
      nSigma: Double = 3.0,
      exact: Boolean = false): Model = {
    // Iqr: ONE sketch per column queried at both probes (r21, guide §2.3)
    // — percentile[_approx](c, array(0.25, 0.75)) builds a single
    // aggregation buffer where two scalar calls built two identical
    // ones; same inserts, same summary, bit-identical answers at each
    // probe in both exact and sketch mode, at half the buffer work.
    val aggs: Seq[Column] = method match {
      case Iqr =>
        cols.map(c =>
          graft.Exprs.pctArray(col(c).cast("double"), Seq(0.25, 0.75), exact)
            .as(s"${c}__q"))
      case Sdv =>
        cols.flatMap(c => Seq(avg(col(c)).as(s"${c}__lo"), stddev(col(c)).as(s"${c}__hi")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def pctPair(c: String): (Double, Double) = {
      val arr = row.getSeq[Any](row.fieldIndex(s"${c}__q"))
      require(arr != null && arr.length == 2 && arr.forall(_ != null),
        s"OutlierTreatment.fit($c): percentile aggregate is null " +
          "(empty, all-null, or constant input column)")
      (arr(0).asInstanceOf[Double], arr(1).asInstanceOf[Double])
    }
    val bounds = cols.map { c =>
      val (a, b) = method match {
        case Iqr => pctPair(c)
        case Sdv => (
          graft.Exprs.requireD(row, s"${c}__lo", s"OutlierTreatment.fit($c)"),
          graft.Exprs.requireD(row, s"${c}__hi", s"OutlierTreatment.fit($c)"))
      }
      method match {
        case Iqr =>
          val iqr = b - a
          c -> Bounds(a - iqrK * iqr, b + iqrK * iqr)
        case Sdv =>
          c -> Bounds(a - nSigma * b, a + nSigma * b)
      }
    }.toMap
    Model(bounds)
  }

  /** Robust dispersion profile: per-column median and MAD (median of
    * |x − median|), the outlier-insensitive counterpart of the
    * mean/stddev row in describe — a single extreme value moves stddev
    * arbitrarily but not the MAD. Two wide agg passes (medians, then
    * absolute deviations — the second pass needs the first's scalars),
    * each one job over all columns; like every percentile op, approx
    * sketch by default, exact for the small-SF oracle. */
  def madTable(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    val medAggs = cols.map(c => graft.Exprs.pct(col(c).cast("double"), 0.5, exact).as(c))
    val medRow = df.agg(medAggs.head, medAggs.tail: _*).collect()(0)
    val med = cols.map(c => c -> graft.Exprs.requireD(medRow, c, s"madTable($c)")).toMap
    val madAggs = cols.map(c =>
      graft.Exprs.pct(abs(col(c).cast("double") - lit(med(c))), 0.5, exact).as(c))
    val madRow = df.agg(madAggs.head, madAggs.tail: _*)
    val stacked = cols.map(c =>
      struct(lit(c).as("column"), round(lit(med(c)), 6).as("median"), round(col(c), 6).as("mad")))
    madRow
      .select(explode(array(stacked: _*)).as("s"))
      .select(col("s.column"), col("s.median"), col("s.mad"))
  }
}
