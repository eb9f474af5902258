package graft.tools

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Support.oracleMode = true
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Seq("best_of_n", "preference_pairs", "semantic_decontam",
      "cross_doc_neighbors_exact", "majority_vote").foreach { q =>
      val fp = graft.plans.PlanAudit.fingerprint(
        graft.SparkEntry.queries(q)(spark, dir))
      println(s"FP $q -> ${fp.toSeq.sortBy(_._1)}")
    }
  }
}
