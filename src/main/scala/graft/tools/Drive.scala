package graft.tools

import graft.Sessions

/** Scratch verification driver: time lang_id / text_stats at sf0.1 (the
  * single-pass token-counting rewrite; r2 probe baseline was 0.64 s). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")

    spark.read.parquet(s"$sf/region.parquet").groupBy("r_name").count().count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[drive] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    for (q <- Seq("lang_id", "text_stats"); r <- 1 to 2)
      time(s"$q run$r")(graft.SparkEntry.queries(q)(spark, sf).count())

    println("[drive] lang_id plan:")
    graft.SparkEntry.queries("lang_id")(spark, sf).explain()
    spark.stop()
  }
}
