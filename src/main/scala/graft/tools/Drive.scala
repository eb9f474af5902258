package graft.tools

import org.apache.spark.sql.functions._

/** Scratch driver for ad-hoc plan/timing probes during development —
  * rewritten per investigation; not part of any shipped surface. Current
  * probe: A/B the codegen'd AdcDot kernel against the r17
  * aggregate∘zip_with ADC formulation over a 1M-candidate scoring scan.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graft.Bridge

    val corpus = "/tmp/graft_compaction_corpus"
    if (!new java.io.File(s"$corpus/_SUCCESS").exists()) {
      Recall.clusteredCorpus(spark, n = 1120000L, dims = 16,
          clusters = 1024, noise = 1.0)
        .write.mode("overwrite").parquet(corpus)
    }
    val all = spark.read.parquet(corpus).filter(col("vec_id") < 1000000L)
    // a synthetic codes table shaped like the PQ scoring scan (m=8
    // subspaces, 256 codes each), MATERIALIZED so the probe times the
    // scoring scan, not the synthetic-data expressions; the lut rides a
    // broadcast 1-row join exactly like the real per-query lut
    val m = 8; val codes = 256
    val codesPath = "/tmp/graft_adc_probe_codes"
    if (!new java.io.File(s"$codesPath/_SUCCESS").exists())
      all.select(col("vec_id"),
        expr(s"transform(sequence(0, ${m - 1}), j -> CAST(pmod(xxhash64(vec_id, j), $codes) AS INT))").as("__codes"),
        lit(1.0).as("__rn"))
        .write.mode("overwrite").parquet(codesPath)
    val lutDf = spark.range(1).select(
      expr(s"transform(sequence(0, ${m * codes - 1}), s -> CAST(s AS DOUBLE) / 1000.0)").as("__lut"))
    val withLut = spark.read.parquet(codesPath).crossJoin(broadcast(lutDf))

    val oldAdc = expr(
      s"aggregate(zip_with(__codes, sequence(0, ${m - 1}), " +
        s"(c, j) -> element_at(__lut, j * $codes + c + 1)), " +
        "0D, (acc, x) -> acc + x)") / col("__rn")
    val newAdc = Bridge.column(graft.expressions.AdcDot(
      Bridge.expression(col("__codes")),
      Bridge.expression(col("__lut")),
      Bridge.expression(lit(codes)))) / col("__rn")

    // equality first: both formulas agree on every row
    val diff = withLut.select(oldAdc.as("a"), newAdc.as("b"))
      .filter(abs(col("a") - col("b")) > 1e-12).count()
    println(s"PROBE adc_equal mismatches=$diff")

    for ((label, c) <- Seq("old_hof" -> oldAdc, "new_codegen" -> newAdc);
         it <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = withLut.select(sum(c)).head().getDouble(0)
      println(f"""PROBE adc_$label iter=$it sec=${(System.nanoTime() - t0) / 1e9}%.3f sum=$n%.1f""")
    }
    spark.stop()
  }
}
