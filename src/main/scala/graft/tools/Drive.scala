package graft.tools

import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely to exercise whatever
  * changed: call operators on /root/testdata/sf0.001, show() results,
  * explain() plans. Not part of the library surface. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (i <- 1 to 3)
      time(s"ilm_$i")(
        graft.queries.LlmQueries.queries("interleaved_loss_masks")(spark, dir).count())
    spark.stop()
  }
}
