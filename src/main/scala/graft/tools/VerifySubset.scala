package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: dump a comma-separated subset of SparkEntry.queries (plus their
  * oracle SQL) for a quick tools/compare_oracle.py run while iterating —
  * graft.Verify's shape, without paying for all registered queries.
  *
  * Usage: runMain graft.tools.VerifySubset <name,name,...> <sfDir> <outDir> */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSet
    val Array(_, sfDir, outDir) = args.take(3)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      // match graft.Verify / Sessions.local: Spark 4 ANSI mode would throw
      // on x/0 and corr(constant) where the oracle expects null
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Support.oracleMode = true
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries.filter(kv => names(kv._1)).foreach { case (name, fn) =>
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"wrote $name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
