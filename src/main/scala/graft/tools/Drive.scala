package graft.tools

import graft.Sessions

/** Scratch verification driver: run registered queries in oracle mode and
  * dump results to parquet for a hand DuckDB comparison. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("key_profile_topk")
    graft.queries.Support.oracleMode = true
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.show(10, truncate = false)
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/drive_out/$name")
    }
    spark.stop()
  }
}
