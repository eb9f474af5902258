package graft.tools

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = "/root/testdata/sf0.001"
    Seq("gopher_rules", "c4_rules", "perplexity_buckets").foreach { n =>
      val fp = graft.plans.PlanAudit.fingerprint(graft.SparkEntry.queries(n)(spark, dir))
      val s = fp.toSeq.sortBy(_._1).map { case (k, v) => s""""$k" -> $v""" }.mkString(", ")
      println(s"""    "$n" -> Map($s),""")
    }
  }
}
