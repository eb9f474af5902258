package graft.tools

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Support.oracleMode = true
    val dir = "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries("chat_token_loss_mask")(spark, dir)
    df.coalesce(1).write.mode("overwrite").parquet("/tmp/graft_mask")
    df.show(5)
  }
}
