package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-drive")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // plan shape of the quantile-state sketch agg: is it two-phase
    // (partial ObjectHashAggregate before the exchange)?
    val ev = graft.queries.Support.events(spark, "/root/testdata/sf0.001")
    val state = graft.dp.QuantileState.quantileSketch(ev, "user_id", "value")
    state.explain("formatted")
  }
}
