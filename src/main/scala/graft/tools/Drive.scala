package graft.tools

import graft.Sessions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch verification driver: compare the window row_number<=k plan
  * against the TopKStructs aggregate plan on Spark 4.1. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val viaWindow = orders.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
    println("=== window plan ===")
    println(viaWindow.queryExecution.executedPlan.toString.take(3000))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    for (i <- 1 to 3) time(s"window_$i")(viaWindow.count())
    val viaAgg = graft.dp.TopK.topKPerKey(orders, Seq("o_custkey"), Seq("o_totalprice", "o_orderkey"), 3)
    for (i <- 1 to 3) time(s"agg_$i")(viaAgg.count())
    spark.stop()
  }
}
