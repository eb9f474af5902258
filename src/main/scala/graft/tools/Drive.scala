package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = "8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // No-split bin packing end-to-end on real testdata: plan + summary,
    // then the physical plan (expect: one Exchange on shard, a
    // partition-local Sort, MapPartitions — no global sort, no window)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counts = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val plan = graft.text.Packing.binPackNoSplit(counts, "doc_id", "n_tokens",
      ctxTokens = 256, nShards = 4)
    plan.orderBy("shard", "doc_id").show(12, truncate = false)
    graft.text.Packing.binPackSummary(plan, 256).orderBy("shard").show(false)
    plan.explain("formatted")
  }
}
