package graft.dp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The reference's 4-way column type taxonomy — numerical / categorical /
  * datelike / boolean — which drives imputation defaults, encoding choice and
  * outlier eligibility (reference: src/ta_lib/pyspark/dp.py:185-294).
  *
  * Re-expressed as a pattern match on Catalyst DataTypes (metadata-only, no
  * jobs run).
  */
object Taxonomy {

  sealed trait ColKind
  case object Numerical extends ColKind
  case object Categorical extends ColKind
  case object Datelike extends ColKind
  case object Boolean extends ColKind
  case object Other extends ColKind

  def kindOf(dt: DataType): ColKind = dt match {
    case _: NumericType                     => Numerical
    case StringType                         => Categorical
    case DateType | _: TimestampType        => Datelike
    case BooleanType                        => Boolean
    case _                                  => Other
  }

  def numericalColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if kindOf(f.dataType) == Numerical => f.name }.toSeq

  def categoricalColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if kindOf(f.dataType) == Categorical => f.name }.toSeq

  def datelikeColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if kindOf(f.dataType) == Datelike => f.name }.toSeq

  def booleanColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if kindOf(f.dataType) == Boolean => f.name }.toSeq

  /** dtype of a single column as a taxonomy kind
    * (reference: dp.py:266-294 `identify_col_data_type`). */
  def identifyColDataType(df: DataFrame, col: String): ColKind =
    kindOf(df.schema(col).dataType)
}
