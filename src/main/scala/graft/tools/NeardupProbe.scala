package graft.dedup

import org.apache.spark.sql.functions._

/** One-off decomposition of the neardup_full sf10 scaling step: which
  * stage is super-linear — banding, candidate generation, verification,
  * or clustering — and does shuffle-partition sizing explain it?
  * Usage: runMain graft.dedup.NeardupProbe [initialPartitionNum]. */
object NeardupProbe {
  def main(args: Array[String]): Unit = {
    val extra = args.headOption.map(n => Map(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> n))
      .getOrElse(Map.empty[String, String])
    val spark = graft.Sessions.local(extra = extra)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/graft_sf10")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // warmup
    spark.read.parquet(s"$dir/documents.parquet").groupBy().count().count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val sh = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("__sh"))
    time("shingle-scan") { sh.select(sum(size(col("__sh")))).count() }
    val banded = Dedup.bandedBuckets(sh, "doc_id", 16, 2, 1000)
    time("banded-buckets") { banded.count() }
    time("pairs") {
      graft.dedup.Dedup
        .minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.7).count()
    }
    time("pairs+clusters") {
      Dedup.nearDupClusters(
        graft.dedup.Dedup
          .minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.7)).count()
    }
    spark.stop()
  }
}
