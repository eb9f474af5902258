package graft.tools
import graft.Sessions
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (i <- 1 to 2) time(s"dedup_minhash_$i")(graft.queries.LlmQueries.queries("dedup_minhash")(spark, dir).count())
    for (i <- 1 to 2) time(s"dedup_simhash_$i")(graft.queries.LlmQueries.queries("dedup_simhash")(spark, dir).count())
    for (i <- 1 to 2) time(s"iv_table_$i")(graft.queries.FeatureQueries.queries("iv_table")(spark, dir).count())
    spark.stop()
  }
}
