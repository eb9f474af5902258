package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Scratch verification driver: plan shapes for the round-5 operators. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")

    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val topk = graft.dp.TopK.topKPerKey(orders, Seq("o_custkey"), Seq("o_totalprice", "o_orderkey"), 3)
    val plan = topk.queryExecution.executedPlan.toString
    println("[drive] topk plan has partial agg: " + plan.contains("partial_graft_top_k"))
    println("[drive] topk agg operator: " +
      plan.linesIterator.filter(_.contains("graft_top_k")).map(_.trim.take(120)).mkString(" // "))

    val urgent = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val bloomed = graft.dp.BloomJoin.prefilter(
      spark.read.parquet(s"$sf/lineitem.parquet"), urgent, "l_orderkey", "o_orderkey", 100000L, 0.01)
    val bplan = bloomed.queryExecution.executedPlan.toString
    println("[drive] bloom probe in scan filter stage: " + bplan.contains("graft_bloom_might_contain"))
    println("[drive] bloom plan WholeStageCodegen: " + bplan.contains("WholeStageCodegen"))
    bloomed.explain("formatted")
    spark.stop()
  }
}
