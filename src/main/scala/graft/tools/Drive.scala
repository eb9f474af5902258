package graft.tools

import graft.Sessions

/** Scratch verification driver: time a registered query cold/warm.
  * `state-demo` as a query name instead drives the streaming incremental
  * state maintenance end to end over the real file-stream source. */
object Drive {

  private def stateDemo(spark: org.apache.spark.sql.SparkSession, sf: String): Unit = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_state_demo").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
    // two arriving batches, written as separate files into the watched dir
    ev.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/in")
    val stream = graft.streaming.Streaming.readEventStream(spark, s"$dir/in")
    val q = graft.streaming.Streaming.maintainAggState(
      stream, "user_id", "value", s"$dir/state", s"$dir/ckpt")
    q.processAllAvailable()
    ev.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(s"$dir/in")
    q.processAllAvailable()
    q.stop()
    val state = spark.read.parquet(s"$dir/state")
      .agg(sum("n"), count(lit(1))).head()
    val expect = ev.agg(count(lit(1)), countDistinct(col("user_id"))).head()
    println(s"PROBE state-demo: folded n=${state.getLong(0)} keys=${state.getLong(1)} " +
      s"expected n=${expect.getLong(0)} keys=${expect.getLong(1)} " +
      (if (state.getLong(0) == expect.getLong(0) && state.getLong(1) == expect.getLong(1))
        "MATCH" else "MISMATCH"))
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("ann_ivf_topk")
    names.filter(_ == "state-demo").foreach(_ => stateDemo(spark, sf))
    names.filterNot(_ == "state-demo").foreach { name =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sf).count()
        println(f"PROBE ${name}_$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
