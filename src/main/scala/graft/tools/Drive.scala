package graft.tools

import graft.Sessions

/** Scratch verification driver: time a registered query cold/warm. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("ann_ivf_topk")
    names.foreach { name =>
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sf).count()
        println(f"PROBE ${name}_$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      }
    }
    spark.stop()
  }
}
