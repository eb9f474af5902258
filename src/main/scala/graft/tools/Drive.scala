package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: A/B the codegen'd DequantizeInt8 kernel against the r17
  * interpreted transform over a 1M-row quantized index payload.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graft.Bridge
    import graft.similarity.{AnnIndex, Similarity}

    val corpus = "/tmp/graft_compaction_corpus"
    if (!new java.io.File(s"$corpus/_SUCCESS").exists()) {
      Recall.clusteredCorpus(spark, n = 1120000L, dims = 16,
          clusters = 1024, noise = 1.0)
        .write.mode("overwrite").parquet(corpus)
    }
    val idx = "/tmp/graft_dq_probe_idx"
    if (!new java.io.File(s"$idx/meta.parquet/_SUCCESS").exists())
      AnnIndex.buildIvf(
        spark.read.parquet(corpus).filter(col("vec_id") < 1000000L),
        "vec_id", "vec", idx, nlist = 64, quantize = true)
    val stored = spark.read.parquet(s"$idx/corpus.parquet")

    def oldDq(q: org.apache.spark.sql.Column) =
      transform(q("codes"), c => c.cast("double") * q("scale").cast("double"))
    val newDq = Similarity.dequantizeInt8(col("__q"))

    // equality: the kernel reproduces the transform bit for bit
    val mism = stored.select(
        Similarity.dot(oldDq(col("__q")), oldDq(col("__q"))).as("a"),
        Similarity.dot(newDq, newDq).as("b"))
      .filter(col("a") =!= col("b")).count()
    println(s"PROBE dq_equal mismatches=$mism")

    for ((label, cv) <- Seq("old_hof" -> oldDq(col("__q")), "new_codegen" -> newDq);
         it <- 1 to 3) {
      val t0 = System.nanoTime()
      val s = stored.select(sum(Similarity.dot(cv, cv))).head().getDouble(0)
      println(f"""PROBE dq_$label iter=$it sec=${(System.nanoTime() - t0) / 1e9}%.3f sum=$s%.1f""")
    }
    spark.stop()
  }
}
