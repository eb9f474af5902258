package graft.tools
import graft.Sessions
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (i <- 1 to 3) time(s"bradley_terry_$i")(graft.queries.AlignQueries.queries("bradley_terry")(spark, dir).count())
    for (i <- 1 to 2) time(s"dpo_render_conversation_$i")(graft.queries.AlignQueries.queries("dpo_render_conversation")(spark, dir).count())
    spark.stop()
  }
}
