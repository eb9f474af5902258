package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-drive")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // readEvolved: evolving parquet dir union + pinned-schema pruning
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drive_evolve").toString
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/v1")
    Seq((2L, "y", 9.0)).toDF("id", "a", "b").write.parquet(s"$dir/v2")
    val m = graft.io.Tables.readEvolved(spark, Seq(s"$dir/v1", s"$dir/v2"))
    m.orderBy("id").show()
    graft.io.Tables.readEvolved(spark, Seq(s"$dir/v1", s"$dir/v2"), Some(m.schema))
      .explain("formatted")
  }
}
