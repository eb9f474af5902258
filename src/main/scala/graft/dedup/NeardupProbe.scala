package graft.dedup

import org.apache.spark.sql.functions._

/** One-off decomposition of the neardup_full sf10 scaling step: which
  * stage is super-linear — banding, candidate generation, verification,
  * or clustering. One stage per invocation so stages don't contaminate
  * each other's JVM.
  * Usage: runMain graft.dedup.NeardupProbe <stage> [initialPartitionNum]
  * with stage in banding | cands | pairs | clusters. */
object NeardupProbe {
  def main(args: Array[String]): Unit = {
    val stage = args.headOption.getOrElse("pairs")
    val extra = args.drop(1).headOption.map(n => Map(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> n))
      .getOrElse(Map.empty[String, String])
    val spark = graft.Sessions.local(extra = extra)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR", "/tmp/graft_sf10")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // warmup
    spark.read.parquet(s"$dir/documents.parquet").groupBy().count().count()

    val sh = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("__sh"))
    val t0 = System.nanoTime()
    val n = stage match {
      case "banding" =>
        Dedup.bandedBuckets(sh, "doc_id", 16, 2, 1000).count()
      case "cands" =>
        Dedup.minhashCandidatePairs(docs, "doc_id", "text").count()
      case "pairs" =>
        Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.7).count()
      case "clusters" =>
        Dedup.nearDupClusters(
          Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.7)).count()
      // the distributed-clustering regime proper: the SymSpell pair graph
      // has millions of edges (3.2M at sf1, 40.7M at sf10) — far past the
      // 1M driver union-find bound, so this times the pointer-jumping
      // loop itself on a big graph
      case "simhash" =>
        Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3).count()
      case "fuzzy-clusters" =>
        val cust = spark.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey"), col("c_name"))
        Dedup.nearDupClusters(
          Fuzzy.fuzzyPairsD1(cust, "c_custkey", "c_name")
            .select(col("id_a"), col("id_b"))).count()
      case other => sys.error(s"unknown stage $other")
    }
    println(f"PROBE $stage%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    spark.stop()
  }
}
