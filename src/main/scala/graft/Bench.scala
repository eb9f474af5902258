package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. Honest accounting: a query that throws is
  * recorded with time -1 (never confused with a fast success), and the
  * error count + names are part of the output.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results: Seq[(String, Double, Long, Option[String])] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val n = fn(spark, sfDir).count()
          (name, (System.nanoTime() - t0) / 1e9, n, None)
        } catch {
          case e: Throwable =>
            (name, -1.0, -1L, Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }

    val ok = results.filter(_._2 >= 0)
    val failed = results.filter(_._2 < 0)
    val qs = results
      .map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed
      .map { case (k, _, _, e) => "\"" + k + "\":\"" + e.getOrElse("").replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120) + "\"" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    failed.foreach { case (k, _, _, e) => System.err.println(s"[bench] FAILED $k: ${e.getOrElse("")}") }
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size},"errors":$errs}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
