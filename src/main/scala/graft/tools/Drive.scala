package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-drive")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val scored = events.select(
      (xxhash64(col("event_id")) % 1000 / 1000.0).as("score"),
      (col("user_id") % 2).cast("double").as("label"))

    def oldStyle(df: DataFrame): DataFrame = {
      val pred = when(col("score") > 0.5, 1.0).otherwise(0.0)
      val y = col("label")
      df.agg(
        sum(when(pred === 1.0 && y === 1.0, 1L).otherwise(0L)).as("tp"),
        sum(when(pred === 1.0 && y === 0.0, 1L).otherwise(0L)).as("fp"),
        sum(when(pred === 0.0 && y === 0.0, 1L).otherwise(0L)).as("tn"),
        sum(when(pred === 0.0 && y === 1.0, 1L).otherwise(0L)).as("fn"))
    }
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm both paths once
    oldStyle(scored).collect()
    graft.eval.Metrics.binaryMetricsAtThreshold(scored, "score", "label", 0.5).collect()
    (1 to 3).foreach { i =>
      time(s"old  global-agg #$i")(oldStyle(scored).collect())
      time(s"new  delegated  #$i")(
        graft.eval.Metrics.binaryMetricsAtThreshold(scored, "score", "label", 0.5).collect())
    }
    graft.eval.Metrics.binaryMetricsAtThreshold(scored, "score", "label", 0.5).explain("formatted")
    spark.stop()
  }
}
