package graft.dp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row/column cleaning operators.
  *
  * Capability parity with the reference's data-prep surface
  * (reference: src/ta_lib/pyspark/dp.py:19-308, production/data_cleaning.py),
  * re-expressed as single-pass declarative column expressions so Catalyst
  * can fuse them into one whole-stage-codegen scan — the reference's
  * per-column job loops (dp.py:34-43) become one wide `agg`.
  */
object Cleaning {

  /** camelCase / spaced column names → snake_case
    * (reference: dp.py:109-131 `clean_columns`). Metadata-only rename. */
  def cleanColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(snakeCase): _*)

  private[graft] def snakeCase(name: String): String =
    name.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[^A-Za-z0-9]+", "_")
      .toLowerCase
      .replaceAll("_+", "_")
      .stripPrefix("_")
      .stripSuffix("_")

  /** Per-column string scrub: collapse whitespace, trim, lowercase, strip
    * bracketed segments, whitelist characters
    * (reference: dp.py:134-181 `_clean_string_val` — NB the reference returns
    * inside its loop so only the first column is cleaned; we clean all
    * requested columns, divergence documented in DIVERGENCES.md). */
  def cleanStringColumn(c: Column): Column = {
    val noBrackets = regexp_replace(c, "\\(.*?\\)|\\[.*?\\]", "")
    val whitelist = regexp_replace(noBrackets, "[^a-zA-Z0-9 .,_-]", "")
    trim(regexp_replace(lower(whitelist), "\\s+", " "))
  }

  def cleanStringValues(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, cleanStringColumn(col(c))))

  /** Flag categorical columns whose distinct count changes under lower() —
    * i.e. case-inconsistent category labels
    * (reference: dp.py:19-47 `check_column_data_consistency`).
    *
    * One wide aggregate pass instead of the reference's per-column jobs.
    */
  def checkColumnDataConsistency(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exprs = cols.flatMap { c =>
      Seq(
        countDistinct(col(c)).as(s"${c}__raw"),
        countDistinct(lower(col(c))).as(s"${c}__lower"))
    }
    val row = df.agg(exprs.head, exprs.tail: _*)
    // unpivot into (column, distinct_raw, distinct_lower, consistent)
    val stacked = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"${c}__raw").as("distinct_raw"),
        col(s"${c}__lower").as("distinct_lower"))
    }
    row
      .select(explode(array(stacked: _*)).as("s"))
      .select(col("s.column"), col("s.distinct_raw"), col("s.distinct_lower"))
      .withColumn("consistent", col("distinct_raw") === col("distinct_lower"))
  }

  /** Parse a string date column of the reference's raw format
    * (reference: production/data_cleaning.py:48-53). */
  def parseDate(c: Column, fmt: String = "ddMMMyyyy:HH:mm:ss"): Column =
    to_date(to_timestamp(c, fmt))

  /** Keep rows at or before a reference date
    * (reference: production/data_cleaning.py:53). */
  def filterUpTo(df: DataFrame, dateCol: String, refDate: String): DataFrame =
    df.filter(col(dateCol) <= lit(refDate).cast("date"))

  /** Rows within a label window (ref+1d, ref+windowDays]
    * (reference: production/data_cleaning.py:141-144). */
  def labelWindow(df: DataFrame, dateCol: String, refDate: String, windowDays: Int): DataFrame =
    df.filter(
      col(dateCol) > lit(refDate).cast("date") &&
        col(dateCol) <= date_add(lit(refDate).cast("date"), windowDays))

  /** Full-row or subset dedup (reference: dp.py:297-308). */
  def dropDuplicateRows(df: DataFrame, subset: Seq[String] = Nil): DataFrame =
    if (subset.isEmpty) df.dropDuplicates() else df.dropDuplicates(subset)

  /** (rows, cols) — the reference's get_shape; rows triggers a count. */
  def shape(df: DataFrame): (Long, Int) = (df.count(), df.columns.length)
}
