package graft.tools

import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

    val tfidf = graft.text.TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 5)
    tfidf.show(12, truncate = false)
    tfidf.explain("formatted")

    val bm25 = graft.text.TextAnalysis.bm25TopTerms(docs, "doc_id", "text", k = 5)
    bm25.show(12, truncate = false)
    bm25.explain("formatted")
  }
}
