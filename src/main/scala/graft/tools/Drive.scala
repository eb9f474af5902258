package graft.tools

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Support.oracleMode = true
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Seq("fim_transform", "span_corruption", "prefix_lm_split", "ul2_mix",
      "unimax_plan", "unimax_sample", "rouge_l_score", "rouge_dedup_pairs",
      "prototype_prune_exact", "hard_negatives_exact", "script_profile",
      "chat_token_loss_mask").foreach { q =>
      val fp = graft.plans.PlanAudit.fingerprint(
        graft.SparkEntry.queries(q)(spark, dir))
      println(s"FP $q -> $fp")
    }
  }
}
