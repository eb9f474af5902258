package graft.tools

import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = "8")
    spark.sparkContext.setLogLevel("WARN")

    // Drive the NEW catalog stages (interleave-plan / materialize-
    // interleaved / epoch-shuffle) through the real YAML+Jobs surface —
    // the same path a production config takes.
    val work = java.nio.file.Files.createTempDirectory("graft-drive").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(120).write.mode("overwrite").parquet(s"$work/docs")
    spark.read.parquet(s"$work/docs").select(col("doc_id"))
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), (col("doc_id") * 10 + 1).as("asset_id"),
        lit(3L).as("position"), lit(9L).as("patch_tokens"))
      .write.mode("overwrite").parquet(s"$work/assets")
    val yml = java.nio.file.Files.createTempFile("graft-drive", ".yml")
    java.nio.file.Files.writeString(yml,
      """jobs:
        |  - name: tokenizer
        |    fail_fast: true
        |    stages:
        |      - name: vlm
        |        tasks:
        |          - name: train
        |            params: {num_merges: 50}
        |          - name: encode
        |            params: {ids: true}
        |          - name: interleave-plan
        |            params: {ctx_tokens: 192, n_shards: 2}
        |          - name: materialize-interleaved
        |            params: {ctx_tokens: 192, n_shards: 2, image_token_id: -1}
        |          - name: epoch-shuffle
        |            params: {epoch: 1, source: processed.interleaved_bins}
        |""".stripMargin)
    val cfg = Map(
      "core" -> Map("seed" -> 7, "audit_plans" -> true),
      "job_catalog" -> graft.config.Context.loadYaml(yml.toString),
      "data_catalog" -> Map(
        "raw" -> Map("documents" -> s"$work/docs", "assets" -> s"$work/assets"),
        "models" -> Map(
          "bpe_merges" -> s"$work/bpe_merges",
          "bpe_vocab" -> s"$work/bpe_vocab"),
        "processed" -> Map(
          "tokenized" -> s"$work/tokenized",
          "interleaved_plan" -> s"$work/iplan",
          "interleaved_bins" -> s"$work/ibins",
          "epoch_order" -> s"$work/eorder")))
    graft.pipeline.Production.registerAll()
    val ctx = graft.config.Context(cfg, spark)
    val errs = graft.pipeline.Jobs.run(ctx, "tokenizer")
    require(errs.isEmpty, s"catalog job failed: $errs")

    val bins = spark.read.parquet(s"$work/ibins")
    bins.orderBy(col("shard"), col("bin_id")).show(5, truncate = 60)
    val badMedia = bins.select(col("token_ids"), explode(col("media_spans")).as("m"))
      .filter(expr("exists(slice(token_ids, m.start + 1, m.patch_tokens), t -> t != -1)"))
      .count()
    require(badMedia == 0, s"$badMedia media spans not fully placeholder-filled")
    val tiles = bins
      .filter(expr("aggregate(doc_spans, 0, (a, s) -> a + s.len) != seq_len"))
      .count()
    require(tiles == 0, "doc spans must tile seq_len exactly")
    val order = spark.read.parquet(s"$work/eorder")
    require(order.count() == bins.count(), "epoch order must cover every bin")
    order.orderBy(col("shard"), col("epoch_pos")).show(5)
    println(s"bins=${bins.count()} plan-rows=" +
      spark.read.parquet(s"$work/iplan").count() +
      s" epoch-order OK (epoch=${order.select(max("epoch")).head().getInt(0)})")
  }
}
