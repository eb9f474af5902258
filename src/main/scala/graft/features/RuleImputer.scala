package graft.features

import graft.dp.Taxonomy
import graft.profile.Profile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-driven imputation: learn a per-column fill value on train, apply as
  * lazy `when(isnull|isnan, value)` expressions
  * (reference: src/ta_lib/pyspark/dp.py:566-838 `Imputer`).
  *
  * Defaults follow the reference's taxonomy rules: numeric→mean,
  * categorical/boolean→mode, datelike→error. Mean/median for all columns are
  * learned in ONE wide agg; each mode is a top-1 group-by (the only per-column
  * job, same as the reference but without its driver round-trips).
  */
object RuleImputer {

  sealed trait Strategy
  case object Mean extends Strategy
  case object Median extends Strategy
  case object Mode extends Strategy
  final case class Constant(value: Any) extends Strategy

  final case class Model(values: Map[String, Any]) {
    def transform(df: DataFrame): DataFrame =
      values.foldLeft(df) { case (d, (c, v)) =>
        d.withColumn(c, when(Profile.missing(d, c), lit(v)).otherwise(col(c)))
      }
  }

  def defaultStrategy(df: DataFrame, c: String): Strategy =
    Taxonomy.identifyColDataType(df, c) match {
      case Taxonomy.Numerical => Mean
      case Taxonomy.Categorical | Taxonomy.Boolean => Mode
      case other =>
        throw new IllegalArgumentException(
          s"no default imputation for column $c of kind $other (reference dp.py:745 errors on dates too)")
    }

  def fit(df: DataFrame, strategies: Map[String, Strategy], exact: Boolean = false): Model = {
    // batch all mean/median learning into one agg pass
    val aggCols = strategies.collect {
      case (c, Mean)   => avg(col(c)).as(c)
      case (c, Median) => graft.Exprs.pct(col(c).cast("double"), 0.5, exact).as(c)
    }.toSeq
    val aggVals: Map[String, Any] =
      if (aggCols.isEmpty) Map.empty
      else {
        val row = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
        strategies.collect { case (c, Mean | Median) => c -> row.getAs[Any](c) }
      }
    val modeVals: Map[String, Any] = strategies.collect { case (c, Mode) =>
      val top = df
        .filter(!Profile.missing(df, c))
        .groupBy(col(c))
        .agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), asc(c))
        .limit(1)
        .collect()
      c -> (if (top.isEmpty) null else top(0).get(0))
    }
    val constVals: Map[String, Any] = strategies.collect { case (c, Constant(v)) => c -> v }
    Model(aggVals ++ modeVals ++ constVals)
  }

  /** fit with reference-default strategies for the given columns. */
  def fitDefault(df: DataFrame, cols: Seq[String]): Model =
    fit(df, cols.map(c => c -> defaultStrategy(df, c)).toMap)
}
