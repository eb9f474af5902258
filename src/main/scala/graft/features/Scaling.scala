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

  final case class Model(stats: Map[String, (Double, Double)], kind: Kind, suffix: String = "_scaled") {
    def transform(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (a, b))) =>
        val scaled = kind match {
          case MinMax => // a=min, b=max
            if (b == a) lit(0.0) else (col(c) - lit(a)) / lit(b - a)
          case Standard => // a=mean, b=stddev
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
