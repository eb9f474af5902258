package graft.tools

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Support.oracleMode = true
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Seq("grpo_advantages", "best_of_n_curve", "head_to_head",
      "pass_at_k", "krippendorff_alpha").foreach { q =>
      val fp = graft.plans.PlanAudit.fingerprint(
        graft.SparkEntry.queries(q)(spark, dir))
      println(s"FP $q -> ${fp.toSeq.sortBy(_._1)}")
    }
  }
}
