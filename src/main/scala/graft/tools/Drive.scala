package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = "8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    println(s"checkpoint dir = ${spark.sparkContext.getCheckpointDir}")

    // End-to-end: real near-dup pipeline on testdata documents — pairs →
    // clusters (now reliable-checkpointed) → survivors, same path as
    // dedup_cluster_survivors / fuzzy_entity_resolution.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.5)
    val clusters = graft.dedup.Dedup.nearDupClusters(pairs)
    val n = clusters.count()
    val nClusters = clusters.select("cluster_id").distinct().count()
    println(f"clustered rows=$n clusters=$nClusters in ${(System.nanoTime()-t0)/1e9}%.2f s")

    // warm re-run: should be comparable, not multiples slower (the r10
    // warm-instability symptom), and leave no persistent RDD blocks behind
    val t1 = System.nanoTime()
    val n2 = graft.dedup.Dedup.nearDupClusters(pairs).count()
    println(f"warm rerun rows=$n2 in ${(System.nanoTime()-t1)/1e9}%.2f s")
    val leftover = spark.sparkContext.getPersistentRDDs.size
    println(s"persistent RDDs after runs = $leftover")

    // fuzzy entity resolution path (the r10 watch item): SymSpell pairs →
    // clusters, cold then warm
    val cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .filter(col("c_custkey") <= 300).select(col("c_custkey"), col("c_name"))
    val fpairs = graft.dedup.Fuzzy.fuzzyPairsD1(cust, "c_custkey", "c_name")
    val t2 = System.nanoTime()
    val e1 = graft.dedup.Dedup.nearDupClusters(fpairs).count()
    val tCold = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val e2 = graft.dedup.Dedup.nearDupClusters(fpairs).count()
    val tWarm = (System.nanoTime() - t3) / 1e9
    println(f"fuzzy clusters rows cold=$e1 ($tCold%.2f s) warm=$e2 ($tWarm%.2f s) ratio=${tWarm / tCold}%.2f")
    println(s"persistent RDDs at exit = ${spark.sparkContext.getPersistentRDDs.size}")

    // single-scan BPE artifacts on real testdata: train + vocab + encode,
    // audit flags must be uniformly TRUE
    val t4 = System.nanoTime()
    val (merges, vocabIds) = graft.text.Bpe.trainArtifacts(docs, "text", numMerges = 150)
    val encd = graft.text.Bpe.encodeIds(docs, "text", merges, vocabIds)
    val audit = graft.text.Bpe.encodeAudit(
      graft.text.Bpe.encode(docs, "text", merges), "doc_id", "text")
    val bad = audit.filter(!col("roundtrip_ok") || !col("count_sane")).count()
    println(f"bpe: merges=${merges.count()} vocab=${vocabIds.count()} encoded=${encd.count()} " +
      f"auditFailures=$bad in ${(System.nanoTime()-t4)/1e9}%.2f s")
  }
}
