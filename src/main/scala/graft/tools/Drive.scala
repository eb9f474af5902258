package graft.tools

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = "/root/testdata/sf0.001"
    val names = Seq(
      "q1_agg", "join_chain", "e1_feature_pipeline", "set_analysis",
      "tfidf_top_terms", "bm25_top_terms", "binning_quantile",
      "rolling_window", "dedup_exact", "cosine_topk", "dedup_minhash",
      "dsir_weights")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val fp = graft.plans.PlanAudit.fingerprint(df)
      val s = fp.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k" -> $v""" }.mkString(", ")
      println(s"""    "$n" -> Map($s),""")
    }
  }
}
