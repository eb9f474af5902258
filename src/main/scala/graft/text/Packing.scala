package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: the concat-and-chunk plan.
  *
  * Training consumes fixed-length token sequences (e.g. 2k/8k context).
  * The standard data layout concatenates documents in a deterministic
  * order and splits the stream every `ctxTokens` tokens; a document can
  * span a sequence boundary. This operator computes that assignment as a
  * pure table: for every document, which shard it lands in, its token
  * offset in the shard's stream, and the range of training sequences it
  * occupies.
  *
  * Scale shape: one narrow projection (token count per doc), then a
  * running sum windowed PER SHARD. Sharding first is what makes the plan
  * work at 100 TB — each shard's window sorts only its own slice (an
  * ordinary distributed sort-within-groups, parallel across `nShards`),
  * and no global total order over the corpus is ever materialized.
  * `nShards` should be sized so a shard's doc-count fits a task
  * comfortably (thousands of shards at trillion-token scale); downstream
  * writers emit one file per shard and readers stream shards
  * independently.
  */
object Packing {

  /** Packing plan: (shard, doc, token extent, sequence extent) per doc.
    *
    * Deterministic: shard = id % nShards, order within shard = id. Output
    * columns — `shard`, idCol, `n_tokens` (whitespace tokens, the same
    * tokenizer as [[TextAnalysis.tokens]]), `start_offset` (tokens before
    * this doc in its shard stream), `first_seq`/`last_seq` (global
    * sequence ids `shard-local index` of size-`ctxTokens` windows this
    * doc touches), `n_seqs`, and `offset_in_seq` (position of the doc's
    * first token inside `first_seq`). */
  def packingPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame =
    packingPlanFromCounts(
      df.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      idCol, "n_tokens", ctxTokens, nShards)

  /** [[packingPlan]] over a PRECOMPUTED token-count column — the form a
    * real pipeline uses once a trained tokenizer exists: `Bpe.encode`'s
    * `n_tokens` (or any other tokenizer's counts) drive the packing, so
    * the plan matches what the trainer will actually see instead of the
    * whitespace proxy. Same output columns and determinism contract. */
  def packingPlanFromCounts(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame = {
    require(ctxTokens > 0 && nShards > 0, "ctxTokens and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(
        (col(idCol) % nShards).cast("long").as("shard"),
        col(idCol),
        col(nTokensCol).cast("long").as("n_tokens"))
      .withColumn("end_offset", sum(col("n_tokens")).over(w))
      .select(
        col("shard"),
        col(idCol),
        col("n_tokens"),
        (col("end_offset") - col("n_tokens")).as("start_offset"),
        // a zero-token doc occupies no tokens and touches NO sequence:
        // first/last_seq are null and n_seqs is 0 — the unguarded div
        // formula would report one bogus sequence at most offsets and a
        // loader pre-slicing from first_seq/last_seq would read it
        when(col("n_tokens") > 0,
          expr(s"(end_offset - n_tokens) div $ctxTokens")).as("first_seq"),
        when(col("n_tokens") > 0,
          expr(s"(end_offset - 1) div $ctxTokens")).as("last_seq"),
        when(col("n_tokens") > 0,
          expr(s"(end_offset - 1) div $ctxTokens") -
            expr(s"(end_offset - n_tokens) div $ctxTokens") + lit(1L))
          .otherwise(lit(0L)).as("n_seqs"),
        ((col("end_offset") - col("n_tokens")) % ctxTokens).as("offset_in_seq"))
  }

  /** Total sequence count per shard for a packing plan — the shape the
    * trainer's data loader needs to pre-allocate shard readers. */
  def shardSummary(plan: DataFrame): DataFrame =
    plan
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (max(col("last_seq")) + lit(1L)).as("n_seqs"))
}
