package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared expression helpers.
  *
  * Percentiles: estimators default to `percentile_approx` (mergeable
  * t-digest-style sketch, bounded executor memory at any scale); `exact =
  * true` opts into exact `percentile` (buffers all values of a column in one
  * aggregation buffer — only for oracle checks at small SF, mirrors DuckDB
  * `quantile_cont`). The reference uses approxQuantile(relativeError=0)
  * (reference: src/ta_lib/pyspark/dp.py:377).
  */
object Exprs {

  /** Backtick-quote an identifier for use inside `expr(...)` SQL text, so
    * raw column names with spaces/dots/hyphens/reserved words resolve. */
  def bt(name: String): String = "`" + name.replace("`", "``") + "`"

  /** The portable 52-bit md5 draw (graft.expressions.Md5Bits52) as a
    * Column — ONE wrapper for every sampling draw, split salt, and
    * sketch slot, so the cross-engine idiom the DuckDB oracles replay
    * (`conv(substring(md5(x), 1, 13), 16, 10)`) has a single JVM-side
    * definition that cannot drift per call site. */
  def md5Bits52(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.Md5Bits52(
        org.apache.spark.sql.graft.Bridge.expression(c)))

  /** Single percentile of a column; exact or approximate. */
  def pct(c: Column, p: Double, exact: Boolean): Column =
    if (exact) percentile(c, lit(p))
    else percentile_approx(c, lit(p), lit(10000))

  /** Array of percentiles of a column in one aggregate. */
  def pctArray(c: Column, ps: Seq[Double], exact: Boolean): Column = {
    val probes = array(ps.map(lit): _*)
    if (exact) percentile(c, probes)
    else percentile_approx(c, probes, lit(10000))
  }

  /** Null-safe double extraction from an aggregate result row. */
  def getD(row: org.apache.spark.sql.Row, field: String): Option[Double] =
    Option(row.getAs[java.lang.Double](field)).map(_.doubleValue())

  /** Null-safe double extraction that fails with a descriptive error. */
  def requireD(row: org.apache.spark.sql.Row, field: String, what: String): Double =
    getD(row, field).getOrElse(
      throw new IllegalArgumentException(
        s"$what: aggregate '$field' is null (empty, all-null, or constant input column)"))
}
