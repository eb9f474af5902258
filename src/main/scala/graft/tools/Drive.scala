package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch verification driver — edit freely; not part of the library. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(cores = "8")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // interleaved multimodal materialization on real tokenized documents
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
    val (merges, vocab) = graft.text.Bpe.trainArtifacts(docs, "text", 100)
    val tok = graft.text.Bpe.encodeIds(docs, "text", merges, vocab)
      .select(col("doc_id"), col("token_ids"))
    val assets = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), (col("doc_id") * 10 + 1).as("asset_id"),
        lit(3L).as("position"), lit(16L).as("patch_tokens"))
    val IMG = 999999
    val bins = graft.text.Packing.materializeInterleaved(
      tok, assets, "doc_id", "token_ids", "asset_id", "position",
      "patch_tokens", ctxTokens = 512, nShards = 4, imageTokenId = IMG)
    bins.orderBy(col("shard"), col("bin_id")).show(5, truncate = 60)
    // invariants over the whole output: every media span is an IMG run of
    // exactly patch_tokens, and doc spans tile each bin
    val bad = bins.select(col("token_ids"), explode(col("media_spans")).as("m"))
      .filter(expr(
        s"exists(slice(token_ids, m.start + 1, m.patch_tokens), t -> t != $IMG)"))
      .count()
    require(bad == 0, s"$bad media spans not fully IMG-filled")
    val tiles = bins
      .filter(expr("aggregate(doc_spans, 0, (a, s) -> a + s.len) != seq_len"))
      .count()
    require(tiles == 0, "doc spans must tile seq_len exactly")
    println(s"bins=${bins.count()} media-span fill OK, doc-span tiling OK")
    bins.explain("formatted")
  }
}
