package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Scratch verification driver: as-of join plan shape on real testdata —
  * the union + running-window formulation must shuffle each input ONCE on
  * the key (a single Exchange feeding the Window sort), never produce a
  * join, and prune both scans to the referenced columns. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")

    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val probe = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    val ref = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("purchase_value"))
    val joined = graft.dp.Temporal
      .asofJoinBackward(probe, ref, Seq("user_id"), "ts", "ts", Seq("purchase_value"))

    val n = joined.count()
    val matched = joined.filter(col("asof_purchase_value").isNotNull).count()
    println(s"[drive] asof rows=$n matched=$matched")
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val joins = "Join".r.findAllIn(plan).size
    println(s"[drive] hash exchanges=$exchanges joins_in_plan=$joins")
    println("[drive] formatted plan:")
    joined.explain("formatted")
    spark.stop()
  }
}
