package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: A/B the map-only PqEncodeCodes kernel against the r17
  * explode+join+aggregate PQ encode over a 1M-row corpus.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.similarity.Similarity

    val corpus = "/tmp/graft_compaction_corpus"
    if (!new java.io.File(s"$corpus/_SUCCESS").exists()) {
      Recall.clusteredCorpus(spark, n = 1120000L, dims = 16,
          clusters = 1024, noise = 1.0)
        .write.mode("overwrite").parquet(corpus)
    }
    val vecs = spark.read.parquet(corpus).filter(col("vec_id") < 1000000L)
    val corpusVec = Similarity.ivfNormalizedCorpus(vecs, "vec_id", "vec")
    val (books, _) = Similarity.pqFit(corpusVec, "vec_id", m = 8, codes = 256,
      seed = 3L, fitSample = 20000)
    books.persist(); books.count()
    val base = corpusVec.drop("__mlvec")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()

    for (it <- 1 to 2) {
      val t0 = System.nanoTime()
      val n1 = Similarity.pqEncode(base, "vec_id", books, m = 8, sub = 2).count()
      println(f"PROBE pq_encode_old iter=$it sec=${(System.nanoTime() - t0) / 1e9}%.3f rows=$n1")
      val t1 = System.nanoTime()
      val n2 = Similarity.pqEncodeColumns(base, books)
        .select(col("vec_id"), col("__codes"), col("__rn")).count()
      println(f"PROBE pq_encode_new iter=$it sec=${(System.nanoTime() - t1) / 1e9}%.3f rows=$n2")
    }
    base.unpersist(true)
    spark.stop()
  }
}
