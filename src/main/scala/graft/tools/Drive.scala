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

    // overwritePartitions: day-2 rewrite leaves days 1/3 untouched
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drive_dynpart").toString + "/t"
    graft.io.Tables.overwritePartitions(
      Seq(("d1", 1), ("d2", 2), ("d3", 3)).toDF("day", "v"), dir, Seq("day"))
    graft.io.Tables.overwritePartitions(
      Seq(("d2", 99)).toDF("day", "v"), dir, Seq("day"))
    spark.read.parquet(dir).orderBy("day").show()
  }
}
