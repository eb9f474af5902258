package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: per-shard nprobe sweep on the staged 20M 4-shard IVF-PQ index.
  * Diagnosis so far: recall plateau 0.778 at any refine factor, coarse
  * coverage 0.78, int8 ceiling 0.99 — the per-shard auto-nprobe (8)
  * under-covers the sharded layout. Find the operating point.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.similarity.{AnnIndex, Similarity}

    val dir = "/tmp/graft_scale_caprecall_40m_d32c256"
    val idxDir = "/tmp/graft_scale_pqsh_n20m_d32c256"
    val full = spark.read.parquet(dir)
    val queries = full.filter(col("vec_id") < 50L).persist()
    queries.count()
    val corpus = full.filter(col("vec_id") < 20000000L)
    val truth = Similarity
      .cosineTopK(corpus, queries, "vec_id", "vec", "vec_id", 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PROBE truth ready ${truth.size}")
    for (nprobe <- Seq(8, 12, 16, 24, 32, 48, 64)) {
      val t0 = System.nanoTime()
      val got = AnnIndex
        .searchIvfPqSharded(spark, idxDir, queries, "vec_id", "vec",
          k = 10, nprobe = nprobe, refine = 40)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (truth & got).size.toDouble / truth.size
      println(f"""PROBE nprobe_sweep nprobe=$nprobe sec=$sec%.2f recall=$recall%.4f""")
    }
    queries.unpersist()
    spark.stop()
  }
}
