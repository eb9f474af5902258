package graft.tools

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: fingerprints + timings for the r17 ANN queries (sharded exact
  * twins + the compaction identity query) to pin in PlanFingerprintSpec. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (name <- Seq("ann_sharded_search_exact", "ann_ivfpq_sharded_exact",
        "ann_compacted_search_exact")) {
      val t0 = System.nanoTime()
      val df = graft.queries.LlmQueries.queries(name)(spark, dir)
      val fp = graft.plans.PlanAudit.fingerprint(df)
      val scans = graft.plans.PlanAudit.scanCount(df)
      val n = df.count()
      println(s"PROBE $name rows=$n scans=$scans " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2fs fp=$fp")
    }
    spark.stop()
  }
}
