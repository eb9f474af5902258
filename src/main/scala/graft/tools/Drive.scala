package graft.tools

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: re-measure the PlanFingerprintSpec scan-count pins after
  * scanCount learned to walk subquery plans. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (name <- Seq("ann_resharded_search_exact")) {
      val df = graft.queries.LlmQueries.queries(name)(spark, dir)
      println(s"PROBE $name scans=${graft.plans.PlanAudit.scanCount(df)} " +
        s"fp=${graft.plans.PlanAudit.fingerprint(df)}")
    }
    spark.stop()
  }
}
