package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: drive the r18 compaction-crash guards and the reshard
  * state-carry end-to-end on real testdata.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // 1. compact end-to-end: build, append, compact — marker planted,
    //    results identical
    val scratch = java.nio.file.Files.createTempDirectory("drive_r18").toString
    val idx = s"$scratch/ivf"
    graft.similarity.AnnIndex.buildIvf(
      emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", idx, nlist = 16)
    graft.similarity.AnnIndex.appendIvf(
      emb.filter(col("vec_id") % 2 === 1), "embedding", idx)
    val q = emb.filter(col("vec_id") < 3)
    def res() = graft.similarity.AnnIndex
      .searchIvf(spark, idx, q, "vec_id", "embedding", k = 5, nprobe = 16)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    val before = res()
    graft.similarity.AnnIndex.compact(spark, idx)
    val markerOk = new java.io.File(s"$idx/corpus.parquet/_graft_published").exists()
    println(s"PROBE compact identical=${res() == before} marker=$markerOk")

    // 2. crashed-publish guard: simulate live-absent + backup-present
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.rename(
      new org.apache.hadoop.fs.Path(s"$idx/corpus.parquet"),
      new org.apache.hadoop.fs.Path(s"$idx/.precompact_corpus.parquet")))
    val guarded =
      try { graft.io.Compaction.requireNoPendingPublish(spark, s"$idx/corpus.parquet"); false }
      catch { case _: IllegalStateException => true }
    require(fs.rename(
      new org.apache.hadoop.fs.Path(s"$idx/.precompact_corpus.parquet"),
      new org.apache.hadoop.fs.Path(s"$idx/corpus.parquet")))
    println(s"PROBE pending-publish guard fired=$guarded")

    // 3. reshard carries _applied_batches
    val sh = s"$scratch/ivfsh"
    graft.similarity.AnnIndex.buildIvfSharded(emb, "vec_id", "embedding", sh,
      nShards = 3, nlist = 16)
    val m = new org.apache.hadoop.fs.Path(s"$sh/_applied_batches/42")
    fs.mkdirs(m.getParent); fs.create(m, true).close()
    graft.similarity.AnnIndex.reshardIvf(spark, sh, newShards = 2, nlist = 16)
    println(s"PROBE reshard carried markers=${fs.exists(m)}")

    spark.stop()
  }
}
