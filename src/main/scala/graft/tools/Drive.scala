package graft.tools
import graft.Sessions
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely (see .claude/skills/verify). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // Hypothesis test: the pqLut densification transform(sequence(0, N-1),
    // i -> element_at(map, i)) is O(N^2) per row with linear map probes.
    val n = 2048
    val rows = (0 until 5).map(q => (q.toLong, (0 until n).map(i => (i, i * 0.5))))
      .toDF("query_id", "entries")
      .select(col("query_id"), map_from_entries(col("entries")).as("__lutmap"))
      .persist()
    rows.count()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }
    for (_ <- 1 to 3)
      time("element_at densify") {
        rows.select(col("query_id"), expr(
          s"transform(sequence(0, ${n - 1}), " +
            "i -> coalesce(element_at(__lutmap, i), cast('-Infinity' as double)))")
          .as("__lut")).write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
