package graft.tools

/** Scratch verification driver — edit freely to exercise whatever
  * changed: call operators on /root/testdata/sf0.001, show() results,
  * explain() plans. Not part of the library surface. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    graft.SparkEntry.entry(spark).show(5, truncate = false)
    println(s"sf dir: $dir")
    spark.stop()
  }
}
