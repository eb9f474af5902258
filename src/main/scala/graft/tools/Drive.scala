package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: drive the r19 idempotence/safety work end to end on testdata —
  * a replayed dedup release, the tombstone-collision refusal, and the
  * shard-meta-derived accounting.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.{Dedup, MinHashIndex}
    import graft.similarity.AnnIndex

    val sf = "/root/testdata/sf0.001"
    val work = java.nio.file.Files.createTempDirectory("graft_drive_r19").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 150)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 400)

    // 1. replayed near-dup release: pairs() self-exclusion keeps the
    //    accepted set stable instead of annihilating it
    val accepted = Dedup.nearDupDedup(docs, "doc_id", "text", 0.6, 3)
    val mh = s"$work/neardup_index"
    MinHashIndex.build(accepted, "doc_id", "text", mh)
    val replay = MinHashIndex.dedupBatch(spark, mh, docs, "text", 0.6)
    println(s"PROBE replay_docs accepted=${accepted.count()} replayed=${replay.count()}")

    // the fresh-slice plan: the indexedIds anti-join should broadcast and
    // read ONLY the id column of the bucket table (column pruning)
    val fresh = accepted.join(MinHashIndex.indexedIds(spark, mh),
      Seq("doc_id"), "left_anti")
    fresh.explain()
    println(s"PROBE replay_fresh_rows=${fresh.count()} (want 0)")

    // 2. tombstone-collision refusal + repair path
    val ivf = s"$work/ivf"
    AnnIndex.buildIvf(emb, "vec_id", "embedding", ivf, nlist = 8)
    import spark.implicits._
    AnnIndex.deleteIds(spark, ivf, Seq(5L).toDF("vec_id"))
    val refused =
      try { AnnIndex.appendIvf(emb.filter(col("vec_id") === 5L), "embedding", ivf); "NOT-REFUSED" }
      catch { case e: IllegalArgumentException => s"refused: ${e.getMessage.take(100)}" }
    println(s"PROBE reappend $refused")
    AnnIndex.compact(spark, ivf)
    AnnIndex.appendIvf(emb.filter(col("vec_id") === 5L), "embedding", ivf)
    val back = AnnIndex.searchIvf(spark, ivf,
        emb.filter(col("vec_id") === 5L)
          .select((col("vec_id") + 9000L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", k = 1, nprobe = 8)
      .head().getLong(1)
    println(s"PROBE reappend_after_fold served=$back (want 5)")

    // 3. sharded accounting: stats n_rows == shard-meta sum after appends
    val sh = s"$work/sh"
    AnnIndex.buildIvfSharded(emb, "vec_id", "embedding", sh, nShards = 2, nlist = 8)
    AnnIndex.appendIvfSharded(
      spark.read.parquet(s"$sf/embeddings.parquet")
        .filter(col("vec_id") >= 400 && col("vec_id") < 430)
        .select(col("vec_id"), col("embedding")),
      "embedding", sh)
    val st = AnnIndex.stats(spark, sh).head()
    val shardSum = (0 until 2).map(i => spark.read
      .parquet(s"$sh/shard=$i/meta.parquet").head().getAs[Long]("n_rows")).sum
    println(s"PROBE sharded_stats n_rows=${st.getAs[Long]("n_rows")} shard_sum=$shardSum (want equal, 430)")
    spark.stop()
  }
}
