package graft

import org.apache.spark.sql.SparkSession

/** Safe SparkSession construction (replaces the reference's eval-built
  * builder, reference: src/ta_lib/pyspark/context.py:79-92) — a pure fold
  * of config pairs over the builder. */
object Sessions {
  def local(
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      extra: Map[String, String] = Map.empty): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
