package graft.tools

import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Support.oracleMode = true
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fim = graft.text.Objectives.fimTransform(docs, "doc_id", "text",
      rate = 0.8, spmRate = 0.5, seed = 7L)
    fim.select("doc_id", "fim_applied", "fim_mode", "cut_lo", "cut_hi")
      .show(8)
    fim.select(substring(col("fim_text"), 1, 90).as("head")).show(4, truncate = false)
    val sc = graft.text.Objectives.spanCorrupt(docs, "doc_id", "text")
    sc.select("doc_id", "n_spans", "n_masked_tokens").show(6)
    sc.select(substring(col("span_input"), 1, 100).as("in"),
      substring(col("span_target"), 1, 80).as("tgt")).show(3, truncate = false)
    val ul2 = graft.text.Objectives.ul2Mix(docs, "doc_id", "text")
    ul2.groupBy("denoiser").count().show()
  }
}
