package graft.tools

import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely to exercise whatever
  * changed: call operators on /root/testdata/sf0.001, show() results,
  * explain() plans. Not part of the library surface. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (q <- Seq("interleaved_loss_masks", "packed_masks_spans", "tokenizer_data_card")) {
      val df = graft.queries.LlmQueries.queries(q)(spark, dir)
      println(s"FP $q: " + graft.plans.PlanAudit.fingerprint(df).toSeq.sorted.mkString(", ") +
        s" scans=${graft.plans.PlanAudit.scanCount(df)}")
    }
    spark.stop()
  }
}
