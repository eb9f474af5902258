package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binning / discretization (reference: src/ta_lib/pyspark/features.py:293-446
  * `Binner`): quantile bins, explicit splits, fixed-size splits.
  *
  * Bucket assignment is a pure expression (no ml Bucketizer needed for the
  * relational path), so binning N columns stays one codegen'd projection.
  * Quantile split learning is one exact-percentile agg pass.
  */
object Binning {

  /** bucket index for explicit ascending splits: value in [s_i, s_{i+1})
    * → i; below first → 0 is NOT clamped (null), above last → null.
    * Matches Bucketizer's half-open interval convention with the last
    * interval closed. */
  def bucketize(c: Column, splits: Seq[Double]): Column = {
    val n = splits.length
    // a CONSTANT column collapses its distinct quantile splits to one
    // value: zero range conditions would map every row — including the
    // constant itself — to a null bucket. One split = one degenerate
    // bucket: the value itself is bucket 0, everything else stays null
    // (out of the learned range, the same contract as the general case)
    if (n == 1) when(c === lit(splits.head), lit(0)).otherwise(lit(null).cast("int"))
    else {
      val conditions = (0 until n - 1).map { i =>
        val upper =
          if (i == n - 2) c <= lit(splits(i + 1)) // last bucket closed
          else c < lit(splits(i + 1))
        (c >= lit(splits(i)) && upper, lit(i))
      }
      conditions.foldRight(lit(null).cast("int"): Column) { case ((cond, v), acc) =>
        when(cond, v).otherwise(acc)
      }
    }
  }

  final case class Model(splits: Map[String, Seq[Double]], suffix: String = "_bin") {
    def transform(df: DataFrame): DataFrame =
      splits.foldLeft(df) { case (d, (c, s)) =>
        d.withColumn(s"$c$suffix", bucketize(col(c), s))
      }
  }

  /** Learn n-quantile splits for each column in ONE percentile pass
    * (reference QuantileDiscretizer path, features.py:412-427).
    * Approx sketch by default; `exact = true` for oracle checks. */
  def fitQuantile(df: DataFrame, cols: Seq[String], n: Int, exact: Boolean = false): Model = {
    val probes = (0 to n).map(i => i.toDouble / n)
    val aggs = cols.map(c => graft.Exprs.pctArray(col(c).cast("double"), probes, exact).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val splits = cols.map { c =>
      c -> Option(row.getAs[scala.collection.Seq[Any]](c))
        .map(_.toSeq.collect { case d: java.lang.Double => d.doubleValue() }.distinct)
        .getOrElse(throw new IllegalArgumentException(
          s"Binning.fitQuantile($c): percentile returned null (empty or all-null column)"))
    }.toMap
    Model(splits)
  }

  /** Fixed-width splits from lo to hi in n steps
    * (reference fixed-size path, features.py:370-409). */
  def fixedWidthSplits(lo: Double, hi: Double, n: Int): Seq[Double] =
    (0 to n).map(i => lo + (hi - lo) * i / n)

  def withExplicitSplits(splits: Map[String, Seq[Double]]): Model = Model(splits)

  /** Per-GROUP quantile bucket assignment ("normalize quality scores
    * within each language"): learns the n-1 interior quantile edges per
    * group in one combinable aggregate, joins the |groups|-row edge table
    * back (small side — AQE broadcasts it), and assigns
    * bucket = #{edges <= value} as a pure expression over the edges
    * array. Unlike [[fitQuantile]] the edge table never visits the
    * driver, so group cardinality is unbounded; unlike a per-group
    * `ntile` window there is no per-group total sort of the data.
    * Output: all input columns + `bucket` (0 .. nBuckets-1; null value →
    * null bucket; null GROUP KEY → null bucket too — the left join keeps
    * the row but a null key matches no edge row). */
  def groupedBinning(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      nBuckets: Int,
      exact: Boolean = false): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets)
    val v = col(valCol).cast("double")
    val edges = df
      .groupBy(col(keyCol))
      .agg(graft.Exprs.pctArray(v, probes, exact).as("__edges"))
    df.join(edges, Seq(keyCol), "left")
      .withColumn("bucket", size(filter(col("__edges"), e => e <= v)))
      // Gate on the edges too: a null group key matches no edge row, and
      // with legacy sizeOfNull size(filter(null)) = -1, not null.
      .withColumn("bucket", when(v.isNotNull && col("__edges").isNotNull, col("bucket")))
      .drop("__edges")
  }
}
