package graft.tools
import graft.Sessions

/** Same-session A/B probe for bench-drift adjudication (r17 verdict #5):
  * the r17 bench drifted ~13% median vs r16 with byte-identical shuffle
  * bytes on every drifted query — plans unchanged, so the drift is
  * ambient (suite growth, JVM state, machine load), not regressions.
  * This probe times the drift-tail queries in ONE fresh session, several
  * iterations each, so their intrinsic cost is measured without the
  * 250-query suite's accumulated JVM state. Compare the per-query MIN
  * (the least-noise estimator) against both rounds' suite numbers. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // query names come from args (the round's drift tail changes); the
    // default list is the r17 five
    val tail =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "dedup_cluster_survivors", "bigram_logprob", "auc_roc", "join_chain",
        "bradley_terry")
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchQueries
    // warm the JVM + parquet footers once
    spark.read.parquet(s"$dir/documents.parquet").count()
    for (name <- tail) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        all(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"query":"$name","min_sec":${times.min}%.3f,"median_sec":${times.sorted.apply(2)}%.3f,"runs":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
