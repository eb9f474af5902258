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
    * Deterministic: shard = pmod(id, nShards) — non-negative even for
    * hash-assigned ids (plain % returned shard -1 for negative doc_ids,
    * caught by the r17 release e2e) — order within shard = id. Output
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
        pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
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

  /** Materialize the packed sequences themselves — the trainer artifact:
    * one row per (shard, seq_id) holding exactly the tokens of that
    * size-`ctxTokens` window of the shard's concatenated document
    * stream (the final window of a shard may be shorter). Works for any
    * token column element type (string tokens or int ids).
    *
    * Scale shape: this is the one token-level pass of the chain — each
    * token is exploded once with its position, its global offset comes
    * from the same per-shard running sum as [[packingPlanFromCounts]]
    * (window over doc counts, not tokens), and the shuffle groups by
    * (shard, seq) with ≤ `ctxTokens` elements per group — bounded task
    * memory by construction, parallel across shards × sequences. The
    * in-group sort is a `sort_array` over ≤ ctxTokens structs, not a
    * distributed sort. */
  def materializePacked(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame = {
    require(ctxTokens > 0 && nShards > 0, "ctxTokens and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    val withOffsets = df
      .select(
        pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
        col(idCol),
        col(tokensCol).as("__toks"),
        size(col(tokensCol)).cast("long").as("__n"))
      .withColumn("__start", sum(col("__n")).over(w) - col("__n"))
    withOffsets
      .select(col("shard"), col("__start"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .select(
        col("shard"),
        // integer div, not fractional: double arithmetic would lose exact
        // offsets past 2^53 tokens
        expr(s"(__start + __pos) div $ctxTokens").as("seq_id"),
        ((col("__start") + col("__pos")) % ctxTokens).cast("int").as("__slot"),
        col("__tok"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(sort_array(collect_list(struct(col("__slot"), col("__tok")))).as("__packed"))
      .select(
        col("shard"),
        col("seq_id"),
        // named after the input column: packing string tokens must not
        // emit a column called token_ids full of strings
        expr("transform(__packed, p -> p.__tok)").as(tokensCol),
        size(col("__packed")).as("seq_len"))
  }

  /** [[materializePacked]] plus per-sequence DOCUMENT SPANS — the
    * metadata cross-document attention masking needs: for every sequence,
    * `doc_spans ARRAY<STRUCT<start INT, len INT, doc>>` says which slots
    * belong to which source document (a document's slots within one
    * sequence are contiguous by construction, so min-slot + count defines
    * the span exactly). Same bounded-group shape: the span aggregation
    * groups by (shard, seq, doc) then rolls up per sequence, both capped
    * by ctxTokens elements. */
  def materializePackedWithSpans(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame = {
    val packed = materializePacked(df, idCol, tokensCol, ctxTokens, nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    val positions = df
      .select(
        pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
        col(idCol),
        col(tokensCol).as("__toks"),
        size(col(tokensCol)).cast("long").as("__n"))
      .withColumn("__start", sum(col("__n")).over(w) - col("__n"))
      .select(col("shard"), col(idCol), col("__start"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .select(
        col("shard"), col(idCol),
        expr(s"(__start + __pos) div $ctxTokens").as("seq_id"),
        ((col("__start") + col("__pos")) % ctxTokens).cast("int").as("__slot"))
    val spans = positions
      .groupBy(col("shard"), col("seq_id"), col(idCol))
      .agg(min(col("__slot")).as("start"), count(lit(1)).cast("int").as("len"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(sort_array(collect_list(struct(col("start"), col("len"), col(idCol).as("doc"))))
        .as("doc_spans"))
    packed.join(spans, Seq("shard", "seq_id"))
  }

  /** Zip each document's tokens with its per-token mask bits into one
    * struct array, raising loudly on a length mismatch — the shared
    * front of the *WithMasks materializers. Zipping BEFORE the packing
    * explode is what makes mask carriage exact by construction: every
    * token travels with its own bit, so masks survive document wraps
    * across sequence boundaries and oversize-doc truncation without any
    * re-alignment step. */
  private def zipTokensWithMask(
      df: DataFrame, idCol: String, tokensCol: String,
      maskCol: String): DataFrame =
    df.select(
      col(idCol),
      // a NULL array must raise too, not just a length mismatch: under
      // non-ANSI size(null) = -1 on BOTH sides passes the equality,
      // emits a null pair array, and silently shifts every later
      // document's offsets in the shard by -1
      when(col(tokensCol).isNull || col(maskCol).isNull,
        raise_error(concat(
          lit(s"materialize with masks: null '$tokensCol'/'$maskCol' "),
          lit(s"for $idCol "), col(idCol).cast("string"))))
        .when(size(col(tokensCol)) === size(col(maskCol)),
          zip_with(col(tokensCol), col(maskCol),
            (t, m) => struct(t.as("t"), m.as("m"))))
        .otherwise(raise_error(concat(
          lit(s"materialize with masks: '$maskCol' length "),
          size(col(maskCol)).cast("string"),
          lit(s" != '$tokensCol' length "),
          size(col(tokensCol)).cast("string"),
          lit(s" for $idCol "), col(idCol).cast("string"))))
        .as("__pair"))

  /** [[materializePacked]] carrying a per-token LOSS MASK through the
    * packing — the artifact an SFT trainer actually loads: one row per
    * (shard, seq_id) with ALIGNED `tokensCol` and `maskCol` arrays
    * (slot i of the mask governs slot i of the tokens). Compose with
    * [[chatTokenLossMask]]: its token_ids/loss_mask columns are exactly
    * this function's inputs, closing the render → mask → pack chain.
    * Masks survive documents wrapping across sequences (each token is
    * zipped with its own bit before the window explode); a
    * tokens/mask length mismatch raises at execution time.
    * `n_loss_tokens` counts the sequence's unmasked-loss slots — the
    * per-sequence loss-normalization denominator a trainer needs (and
    * the fast way to drop all-context sequences: n_loss_tokens = 0).
    * Same bounded-group scale shape as [[materializePacked]]. */
  def materializePackedWithMasks(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      maskCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame =
    materializePacked(zipTokensWithMask(df, idCol, tokensCol, maskCol),
        idCol, "__pair", ctxTokens, nShards)
      .select(col("shard"), col("seq_id"),
        expr("transform(__pair, p -> p.t)").as(tokensCol),
        expr("transform(__pair, p -> p.m)").as(maskCol),
        col("seq_len"),
        expr("size(filter(__pair, p -> p.m))").as("n_loss_tokens"))

  /** [[materializeNoSplit]] carrying a per-token LOSS MASK: one row per
    * (shard, bin_id) with aligned `tokensCol`/`maskCol` arrays plus the
    * layout's `doc_spans`. A truncated (oversize) document keeps the
    * ctx-prefix of BOTH arrays — the kept tokens keep exactly their own
    * mask bits. Length mismatches raise at execution time;
    * `n_loss_tokens` is the per-bin loss-normalization count. */
  def materializeNoSplitWithMasks(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      maskCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame =
    materializeNoSplit(zipTokensWithMask(df, idCol, tokensCol, maskCol),
        idCol, "__pair", ctxTokens, nShards)
      .select(col("shard"), col("bin_id"),
        expr("transform(__pair, p -> p.t)").as(tokensCol),
        expr("transform(__pair, p -> p.m)").as(maskCol),
        col("seq_len"),
        expr("size(filter(__pair, p -> p.m))").as("n_loss_tokens"),
        col("doc_spans"))

  /** [[materializePackedWithMasks]] AND [[materializePackedWithSpans]]
    * in one artifact — the concat-layout row a trainer doing BOTH
    * cross-document attention masking and loss masking needs: aligned
    * `tokensCol`/`maskCol` arrays, `n_loss_tokens`, and the sequence's
    * `doc_spans`, derived from the SAME zipped pass (one offsets window,
    * one token explode feeding both the pack and the span rollup) —
    * composing the two single-purpose materializers would re-derive the
    * offsets twice and could drift under refactoring; here slot
    * alignment between the mask and the spans is by construction. Same
    * bounded-group scale shape as [[materializePacked]]. */
  def materializePackedWithMasksAndSpans(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      maskCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame =
    materializePackedWithSpans(zipTokensWithMask(df, idCol, tokensCol, maskCol),
        idCol, "__pair", ctxTokens, nShards)
      .select(col("shard"), col("seq_id"),
        expr("transform(__pair, p -> p.t)").as(tokensCol),
        expr("transform(__pair, p -> p.m)").as(maskCol),
        col("seq_len"),
        expr("size(filter(__pair, p -> p.m))").as("n_loss_tokens"),
        col("doc_spans"))

  /** Total sequence count per shard for a packing plan — the shape the
    * trainer's data loader needs to pre-allocate shard readers. */
  def shardSummary(plan: DataFrame): DataFrame =
    plan
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (max(col("last_seq")) + lit(1L)).as("n_seqs"))

  /** One document's packed placement for [[binPackNoSplit]]'s fold.
    * `bin_id`/`offset_in_bin` are None for zero-token docs (they occupy
    * no slots and no bin, mirroring [[packingPlanFromCounts]]'s null
    * `first_seq`). */
  private[text] case class BinPacked(
      shard: Long,
      id: Long,
      n_tokens: Long,
      bin_id: Option[Long],
      offset_in_bin: Option[Long],
      truncated: Boolean)

  /** No-split (document-boundary-respecting) bin packing — the OTHER
    * published packing layout: instead of concatenating and chunking
    * (documents may straddle sequence boundaries, [[packingPlan]]),
    * every training sequence holds only whole documents and is padded to
    * `ctxTokens` — no cross-document attention contamination, at the cost
    * of padding. Assignment is greedy next-fit in deterministic order:
    * within a shard, docs are taken in ascending id and appended to the
    * current bin; a doc that would overflow opens a new bin. A doc with
    * `n_tokens >= ctxTokens` gets a bin of its own (`truncated` flags
    * `n_tokens > ctxTokens` — the loader truncates it or the caller
    * pre-chunks with [[graft.text.TextAnalysis.chunkDocuments]]).
    *
    * Scale shape: the fold is inherently sequential PER SHARD, so shards
    * are the parallel unit exactly as in [[packingPlanFromCounts]] — one
    * hash shuffle on `shard`, a partition-local sort, then a streaming
    * O(1)-memory fold per task (`mapPartitions` is justified here: the
    * running next-fit state has no window/aggregate equivalent). No
    * global sort, no driver state; size `nShards` so a shard's doc count
    * fits a task, thousands of shards at trillion-token scale.
    *
    * Output: `shard`, idCol, `n_tokens`, `bin_id` (shard-local, 0-based,
    * dense), `offset_in_bin`, `truncated`. Deterministic: a pure function
    * of (ids, counts, ctxTokens, nShards), invariant to input
    * partitioning. */
  def binPackNoSplit(
      df: DataFrame,
      idCol: String,
      nTokensCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame = {
    require(ctxTokens > 0 && nShards > 0, "ctxTokens and nShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val ctx = ctxTokens.toLong
    val prepared = df.select(
      pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
      col(idCol).cast("long").as("id"),
      col(nTokensCol).cast("long").as("n_tokens"))
    prepared
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several shards may share a task; the fold resets on shard change
        var curShard = Long.MinValue
        var bin = -1L
        var fill = 0L
        it.map { case (shard, id, n) =>
          if (shard != curShard) { curShard = shard; bin = -1L; fill = 0L }
          if (n == 0L) BinPacked(shard, id, n, None, None, truncated = false)
          else if (n >= ctx) {
            bin += 1; fill = ctx
            BinPacked(shard, id, n, Some(bin), Some(0L), truncated = n > ctx)
          } else if (bin < 0L || fill + n > ctx) {
            bin += 1; fill = n
            BinPacked(shard, id, n, Some(bin), Some(0L), truncated = false)
          } else {
            val off = fill; fill += n
            BinPacked(shard, id, n, Some(bin), Some(off), truncated = false)
          }
        }
      }
      .toDF()
      .withColumnRenamed("id", idCol)
  }

  /** Materialize the no-split layout — the trainer artifact for
    * [[binPackNoSplit]]: one row per (shard, bin_id) with that bin's
    * tokens in placement order (`seq_len` ≤ ctxTokens; the trainer pads
    * the remainder) and `doc_spans` — (start, len, doc) per member
    * document, the attention-mask metadata. Unlike
    * [[materializePackedWithSpans]] the spans need NO second token pass:
    * a no-split bin's spans are exactly the plan's (offset, capped
    * length) rows. A `truncated` document contributes its first
    * `ctxTokens` tokens.
    *
    * Scale shape: the plan's metadata fold, one equi-join back to the
    * token arrays, then the same (shard, bin)-bounded ≤ ctxTokens group
    * aggregation as [[materializePacked]] — `sort_array` over a bounded
    * struct list, never a distributed sort. */
  def materializeNoSplit(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame = {
    val withN = df.select(col(idCol), col(tokensCol).as("__toks"),
      size(col(tokensCol)).cast("long").as("__n"))
    val plan = binPackNoSplit(
        withN.select(col(idCol), col("__n").as("n_tokens")),
        idCol, "n_tokens", ctxTokens, nShards)
      .filter(col("bin_id").isNotNull) // zero-token docs occupy no bin
    val toks = plan
      .join(withN.select(col(idCol), col("__toks")), Seq(idCol))
      .select(col("shard"), col("bin_id"), col("offset_in_bin"),
        posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .filter(col("__pos") < ctxTokens) // a truncated doc keeps its prefix
      .select(col("shard"), col("bin_id"),
        (col("offset_in_bin") + col("__pos")).cast("int").as("__slot"),
        col("__tok"))
      .groupBy(col("shard"), col("bin_id"))
      .agg(sort_array(collect_list(struct(col("__slot"), col("__tok"))))
        .as("__packed"))
    val spans = plan
      .groupBy(col("shard"), col("bin_id"))
      .agg(sort_array(collect_list(struct(
        col("offset_in_bin").cast("int").as("start"),
        least(col("n_tokens"), lit(ctxTokens.toLong)).cast("int").as("len"),
        col(idCol).as("doc")))).as("doc_spans"))
    toks.join(spans, Seq("shard", "bin_id"))
      .select(col("shard"), col("bin_id"),
        expr("transform(__packed, p -> p.__tok)").as(tokensCol),
        size(col("__packed")).as("seq_len"),
        col("doc_spans"))
  }

  /** Padding-efficiency accounting for a [[binPackNoSplit]] plan — the
    * number the layout choice is made on: per shard, how many bins the
    * corpus packs into and what fraction of their `ctxTokens` slots carry
    * real tokens. `truncated_tokens` counts tokens lost to oversize docs;
    * all-zero-token shards report 0 bins and null efficiency. */
  def binPackSummary(plan: DataFrame, ctxTokens: Int): DataFrame = {
    val ctx = lit(ctxTokens.toLong)
    plan
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        coalesce(max(col("bin_id")) + 1L, lit(0L)).as("n_bins"),
        sum(when(col("bin_id").isNotNull, least(col("n_tokens"), ctx))
          .otherwise(0L)).as("packed_tokens"),
        sum(when(col("truncated"), col("n_tokens") - ctx).otherwise(0L))
          .as("truncated_tokens"))
      .withColumn("padding_tokens", col("n_bins") * ctx - col("packed_tokens"))
      .withColumn("efficiency",
        round(col("packed_tokens") / (col("n_bins") * ctx), 6))
  }

  /** Per-epoch data-order shuffle of materialized sequences — the last
    * trainer-side primitive before data order: each epoch the loader
    * should read the sequences in a fresh pseudo-random order, and that
    * order must be reproducible (resume mid-epoch, audit a run) and
    * engine-portable (no JVM RNG state).
    *
    * Every sequence draws a priority from md5(epoch:shard:seq_id) — a
    * pure function of its identity and the epoch, the same portable-draw
    * idiom as [[graft.sampling.Sampling]]'s deterministic splits — and
    * `epoch_pos` is its rank among its SHARD's draws for that epoch. The
    * draw is append-stable: materializing more sequences later never
    * changes an existing sequence's draw, only its rank among newcomers.
    *
    * Scale shape: one window partitioned BY SHARD (shards bound the sort
    * the way they bound packing itself — no global sort, parallel across
    * shards); the trainer reads shards round-robin and each shard's
    * sequences in `epoch_pos` order, which composes shard-parallel reads
    * with within-shard shuffling exactly like the published
    * shard-shuffle loader designs. */
  /** Interleaved MULTIMODAL packing plan — the vision-language training
    * layout: a document's token stream carries media placeholders, each
    * asset occupying `patchTokens` slots at its `position` (a token index
    * into the doc's text), and whole documents pack into no-split bins by
    * their EFFECTIVE length (text tokens + all patch slots). The output
    * is the flat per-asset placement a loader needs to splice patch
    * embeddings at the right offsets:
    *
    *   (shard, bin_id, doc, asset_id, start, patch_tokens, dropped)
    *
    * `start` is the asset's first slot WITHIN ITS BIN: the doc's
    * offset-in-bin + the clamped text position + the patch slots of this
    * doc's earlier assets (ordered by position, ties by asset id — media
    * shift text after them, so a later placeholder's slot moves right by
    * every earlier patch). `dropped = true` marks assets whose span does
    * not fit inside the doc's ctx-capped window (an oversize doc keeps
    * its prefix — same truncation rule as [[binPackNoSplit]]); their
    * `start` is still reported for auditability.
    *
    * Scale shape: one groupBy for effective lengths, the
    * [[binPackNoSplit]] shard-parallel fold, and a window PARTITIONED BY
    * DOC for the running earlier-patch sum — no global sort, no driver
    * state; asset payloads are never touched (the plan is pure metadata,
    * the loader fetches bytes via [[graft.multimodal.Multimodal]]'s
    * asset/byte-range surface). Fully engine-portable arithmetic — the
    * `interleaved_pack` oracle replays the fold and the window in SQL. */
  def interleavedPlan(
      docs: DataFrame,
      assets: DataFrame,
      idCol: String,
      nTokensCol: String,
      assetIdCol: String,
      positionCol: String,
      patchTokensCol: String,
      ctxTokens: Int,
      nShards: Int): DataFrame = {
    require(ctxTokens > 0 && nShards > 0, "ctxTokens and nShards must be positive")
    val nt = docs.select(col(idCol), col(nTokensCol).cast("long").as("__nt"))
    val patchAgg = assets.groupBy(col(idCol))
      .agg(sum(col(patchTokensCol).cast("long")).as("__patches"))
    val eff = nt.join(patchAgg, Seq(idCol), "left")
      .select(col(idCol),
        (col("__nt") + coalesce(col("__patches"), lit(0L))).as("n_tokens"))
    val plan = binPackNoSplit(eff, idCol, "n_tokens", ctxTokens, nShards)
      .filter(col("bin_id").isNotNull)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__pos").asc, col(assetIdCol).asc)
    assets
      .join(nt, Seq(idCol))
      .withColumn("__patch", col(patchTokensCol).cast("long"))
      // clamp the text position into [0, n_text] — a placeholder beyond
      // the text appends at the end rather than tearing the layout
      .withColumn("__pos",
        least(greatest(col(positionCol).cast("long"), lit(0L)), col("__nt")))
      .withColumn("__before",
        coalesce(sum(col("__patch")).over(w) - col("__patch"), lit(0L)))
      .withColumn("__start_in_doc", col("__pos") + col("__before"))
      .join(plan.select(col(idCol), col("shard"), col("bin_id"),
        col("offset_in_bin"), col("n_tokens").as("__eff")), Seq(idCol))
      .select(
        col("shard"),
        col("bin_id"),
        col(idCol).as("doc"),
        col(assetIdCol).as("asset_id"),
        (col("offset_in_bin") + col("__start_in_doc")).as("start"),
        col("__patch").as("patch_tokens"),
        (col("__start_in_doc") + col("__patch") >
          least(col("__eff"), lit(ctxTokens.toLong))).as("dropped"))
  }

  /** Materialize the interleaved layout — the trainer artifact for
    * [[interleavedPlan]]: one row per (shard, bin_id) with the bin's
    * `token_ids` in slot order, where every placed asset's patch span is
    * filled with `imageTokenId` (the placeholder id the model maps to
    * patch embeddings) and `media_spans` carries (start, patch_tokens,
    * asset_id, doc) so the loader knows which spans to overwrite with
    * real features. Text token at in-doc position p lands at slot
    * `offset + p + Σ patches of assets at position <= p` (an asset AT p
    * sits before the text token at p — same arithmetic as the plan).
    *
    * Truncated docs keep their in-window prefix; an asset whose span
    * does not fit is dropped whole (matching the plan's `dropped` flag),
    * which can leave tail slots inside the doc's capped window with no
    * content — those fill with `padTokenId`, so the array stays
    * SLOT-ALIGNED with the spans (a dense collect would silently shift
    * every later span). Assembly uses the slot->token map + sequence
    * fill, bounded per bin by ctxTokens.
    *
    * Scale shape: the plan's fold + one posexplode of member docs'
    * tokens + a (shard, bin)-bounded aggregation — no global sort; the
    * per-token shift is an O(assets-of-doc) expression over the doc's
    * tiny broadcast-joined asset list. */
  def materializeInterleaved(
      docs: DataFrame,
      assets: DataFrame,
      idCol: String,
      tokensCol: String,
      assetIdCol: String,
      positionCol: String,
      patchTokensCol: String,
      ctxTokens: Int,
      nShards: Int,
      imageTokenId: Int,
      padTokenId: Int = 0): DataFrame =
    interleavedCore(docs, assets, idCol, tokensCol, assetIdCol, positionCol,
        patchTokensCol, ctxTokens, nShards,
        tokVal = _.cast("int"),
        mediaVal = lit(imageTokenId).cast("int"),
        padSql = s"CAST($padTokenId AS INT)")
      .select(col("shard"), col("bin_id"), col("__vals").as("token_ids"),
        col("seq_len"), col("doc_spans"), col("media_spans"))

  /** [[materializeInterleaved]] carrying a per-token LOSS MASK through
    * the interleaved layout — the ONE artifact a multimodal SFT trainer
    * loads: aligned `token_ids`/`loss_mask` arrays plus `doc_spans` and
    * `media_spans` per bin. Each text token is zipped with its own mask
    * bit BEFORE the slot assembly (the [[materializePackedWithMasks]]
    * construction), so masks survive the media-placeholder shifts,
    * oversize-doc truncation, and the pad holes a dropped asset leaves
    * inside a truncated doc's window. Patch slots and pad slots are
    * masked out by construction (a trainer never takes loss on patch
    * embeddings or padding); `n_loss_tokens` is the per-bin loss
    * normalization count. Same scale shape as [[materializeInterleaved]]
    * — the mask rides the existing explode, no extra pass. */
  def materializeInterleavedWithMasks(
      docs: DataFrame,
      assets: DataFrame,
      idCol: String,
      tokensCol: String,
      maskCol: String,
      assetIdCol: String,
      positionCol: String,
      patchTokensCol: String,
      ctxTokens: Int,
      nShards: Int,
      imageTokenId: Int,
      padTokenId: Int = 0): DataFrame =
    interleavedCore(zipTokensWithMask(docs, idCol, tokensCol, maskCol),
        assets, idCol, "__pair", assetIdCol, positionCol,
        patchTokensCol, ctxTokens, nShards,
        tokVal = t => struct(
          t.getField("t").cast("int").as("t"),
          t.getField("m").cast("boolean").as("m")),
        mediaVal = struct(
          lit(imageTokenId).cast("int").as("t"), lit(false).as("m")),
        padSql = s"named_struct('t', CAST($padTokenId AS INT), 'm', false)")
      .select(col("shard"), col("bin_id"),
        expr("transform(__vals, v -> v.t)").as("token_ids"),
        expr("transform(__vals, v -> v.m)").as("loss_mask"),
        col("seq_len"),
        expr("size(filter(__vals, v -> v.m))").as("n_loss_tokens"),
        col("doc_spans"), col("media_spans"))

  /** Shared assembly of the interleaved layout over an arbitrary slot
    * VALUE type: `tokVal` lifts a text token to the slot value,
    * `mediaVal` fills placed patch slots, `padSql` (a SQL expression
    * string of the same type) fills the holes. Emits `__vals` plus the
    * layout metadata; the public wrappers name and split the arrays. */
  private def interleavedCore(
      docs: DataFrame,
      assets: DataFrame,
      idCol: String,
      tokensCol: String,
      assetIdCol: String,
      positionCol: String,
      patchTokensCol: String,
      ctxTokens: Int,
      nShards: Int,
      tokVal: Column => Column,
      mediaVal: Column,
      padSql: String): DataFrame = {
    val withN = docs.select(col(idCol), col(tokensCol).as("__toks"),
      size(col(tokensCol)).cast("long").as("n_tokens"))
    val assetPlan = interleavedPlan(withN.select(col(idCol), col("n_tokens")),
      assets, idCol, "n_tokens", assetIdCol, positionCol, patchTokensCol,
      ctxTokens, nShards)
    // per-doc sorted (clamped position, patch) list for the text shift;
    // the left join + null-skipping collect_list gives asset-less docs a
    // correctly-TYPED empty list (coalesce with a bare array() would not)
    val aPrepped = assets
      .join(withN.select(col(idCol), col("n_tokens").as("__nt")), Seq(idCol))
      .select(col(idCol),
        least(greatest(col(positionCol).cast("long"), lit(0L)), col("__nt")).as("__pos"),
        col(patchTokensCol).cast("long").as("__patch"))
    val perDocAssets = withN.select(col(idCol))
      .join(aPrepped, Seq(idCol), "left")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(when(col("__pos").isNotNull,
        struct(col("__pos").as("pos"), col("__patch").as("patch"))))).as("__alist"))
    val eff = withN.join(perDocAssets, Seq(idCol))
      .select(col(idCol), col("__toks"),
        (col("n_tokens") + expr("aggregate(__alist, 0L, (a, x) -> a + x.patch)"))
          .as("n_tokens"),
        col("__alist"))
    val plan = binPackNoSplit(
        eff.select(col(idCol), col("n_tokens")), idCol, "n_tokens",
        ctxTokens, nShards)
      .filter(col("bin_id").isNotNull)
    // text slots: offset + p + Σ patches at position <= p, cut at ctx
    val textSlots = plan
      .join(eff.select(col(idCol), col("__toks"), col("__alist")), Seq(idCol))
      .select(col("shard"), col("bin_id"), col("offset_in_bin"), col("__alist"),
        posexplode(col("__toks")).as(Seq("__p", "__tok")))
      .withColumn("__shift",
        expr("aggregate(filter(__alist, a -> a.pos <= __p), 0L, (a, x) -> a + x.patch)"))
      .select(col("shard"), col("bin_id"),
        (col("offset_in_bin") + col("__p") + col("__shift")).as("__slot"),
        tokVal(col("__tok")).as("__id"))
      .filter(col("__slot") < ctxTokens)
    // media slots: every placed (non-dropped) asset fills its span
    val mediaSlots = assetPlan.filter(!col("dropped"))
      .select(col("shard"), col("bin_id"),
        explode(expr("sequence(start, start + patch_tokens - 1)")).as("__slot"),
        mediaVal.as("__id"))
    // doc + media span metadata per bin
    val docSpans = plan.groupBy(col("shard"), col("bin_id"))
      .agg(sort_array(collect_list(struct(
        col("offset_in_bin").cast("int").as("start"),
        least(col("n_tokens"), lit(ctxTokens.toLong)).cast("int").as("len"),
        col(idCol).as("doc")))).as("doc_spans"))
    // media-less bins need a correctly-typed empty list — same left join
    // + null-skipping collect_list idiom as the per-doc asset list
    val mediaSpans = plan.select(col("shard"), col("bin_id")).distinct()
      .join(assetPlan.filter(!col("dropped")), Seq("shard", "bin_id"), "left")
      .groupBy(col("shard"), col("bin_id"))
      .agg(sort_array(collect_list(when(col("asset_id").isNotNull, struct(
        col("start").cast("int").as("start"),
        col("patch_tokens").cast("int").as("patch_tokens"),
        col("asset_id"), col("doc"))))).as("media_spans"))
    // bin length comes from the PLAN (max over member docs of
    // offset + min(n_tokens, ctx)), not the max occupied slot — a
    // truncated doc whose window ends inside a dropped asset's span
    // leaves its trailing slots empty, and those must still pad-fill
    // so doc_spans tile seq_len exactly
    val binLen = plan.groupBy(col("shard"), col("bin_id"))
      .agg(max(col("offset_in_bin") +
        least(col("n_tokens"), lit(ctxTokens.toLong))).as("__len"))
    // assemble slot-aligned arrays: map + sequence fill pads the holes a
    // dropped asset's tail leaves inside a truncated doc's window
    textSlots.unionByName(mediaSlots)
      .groupBy(col("shard"), col("bin_id"))
      .agg(
        map_from_entries(collect_list(struct(col("__slot"), col("__id"))))
          .as("__m"))
      .join(binLen, Seq("shard", "bin_id"))
      .select(col("shard"), col("bin_id"),
        expr(s"transform(sequence(0L, __len - 1), " +
          s"i -> coalesce(element_at(__m, i), $padSql))").as("__vals"),
        col("__len").cast("int").as("seq_len"))
      .join(docSpans, Seq("shard", "bin_id"))
      .join(mediaSpans, Seq("shard", "bin_id"))
      .select(col("shard"), col("bin_id"), col("__vals"), col("seq_len"),
        col("doc_spans"), col("media_spans"))
  }

  /** ChatML-style turn markers — the fixed template constants of
    * [[renderChatTemplate]]. */
  val ChatStart = "<|im_start|>"
  val ChatEnd = "<|im_end|>"

  /** Per-conversation structure report over a dialogue table — the SFT
    * data-card / QA gate run before [[renderChatTemplate]]: turn and
    * per-role counts, whether the conversation starts with a user turn
    * and ends with an assistant turn (the trainable shape), whether
    * user/assistant roles STRICTLY alternate, and the character mass
    * split (code points; `assistant_char_frac` null on zero content).
    * System turns count toward `n_system`/`total_chars` but are ignored
    * by the start/end/alternation checks (the conventional system-turn
    * exemption). TOOL turns (the public ChatML tool-use convention —
    * tool results interleaved between assistant calls) get the same
    * exemption: agentic SFT traces run user → assistant → tool →
    * assistant → …, which a strict user↔assistant alternation check
    * would flag wholesale; tool turns count toward `n_tool`/
    * `total_chars` and stay out of the shape checks. The exemption must
    * not LAUNDER truncation, though: a trace cut off after a tool
    * result (assistant tool-call with no final answer) would otherwise
    * pass every flag — `dangling_tool` reports whether the
    * conversation's actual last non-system turn is a tool turn, so QA
    * can drop those. Turn numbers must be unique per conversation.
    *
    * Scale shape: one keyed lag window over the non-system/non-tool
    * turns (turn order within a conversation — never global) + two
    * per-conversation aggregates joined on the conversation key.
    * Output: convCol, n_turns, n_user, n_assistant, n_system, n_tool,
    * starts_with_user, ends_with_assistant, strict_alternation,
    * dangling_tool, total_chars, assistant_char_frac. */
  def conversationStats(
      turns: DataFrame,
      convCol: String,
      turnCol: String,
      roleCol: String,
      contentCol: String): DataFrame = {
    val base = turns.select(
      col(convCol), col(turnCol).as("__t"),
      col(roleCol).cast("string").as("__r"),
      length(col(contentCol)).cast("long").as("__len"))
    val agg = base.groupBy(col(convCol)).agg(
      count(lit(1)).as("n_turns"),
      sum(when(col("__r") === "user", 1L).otherwise(0L)).as("n_user"),
      sum(when(col("__r") === "assistant", 1L).otherwise(0L)).as("n_assistant"),
      sum(when(col("__r") === "system", 1L).otherwise(0L)).as("n_system"),
      sum(when(col("__r") === "tool", 1L).otherwise(0L)).as("n_tool"),
      // the truncation canary: the LAST non-system turn (tool included)
      (max(when(col("__r") =!= "system",
        struct(col("__t").as("t"), col("__r").as("r")))).getField("r")
        === "tool").as("dangling_tool"),
      coalesce(sum(col("__len")), lit(0L)).as("total_chars"),
      coalesce(sum(when(col("__r") === "assistant", col("__len"))
        .otherwise(0L)), lit(0L)).as("__achars"))
    val w = Window.partitionBy(col(convCol)).orderBy(col("__t"))
    val shape = base.filter(col("__r") =!= "system" && col("__r") =!= "tool")
      .withColumn("__prev", lag(col("__r"), 1).over(w))
      .groupBy(col(convCol))
      .agg(
        (min(struct(col("__t").as("t"), col("__r").as("r"))).getField("r")
          === "user").as("starts_with_user"),
        (max(struct(col("__t").as("t"), col("__r").as("r"))).getField("r")
          === "assistant").as("ends_with_assistant"),
        (sum(when(col("__r") === col("__prev"), 1L).otherwise(0L)) === 0)
          .as("strict_alternation"))
    agg.join(shape, Seq(convCol), "left")
      .select(col(convCol), col("n_turns"), col("n_user"), col("n_assistant"),
        col("n_system"), col("n_tool"),
        col("starts_with_user"), col("ends_with_assistant"),
        col("strict_alternation"), col("dangling_tool"), col("total_chars"),
        when(col("total_chars") > 0,
          round(col("__achars") / col("total_chars"), 6))
          .as("assistant_char_frac"))
  }

  /** Render multi-turn conversations into single training texts with
    * LOSS-MASK SPANS — the SFT data-prep step between a raw dialogue
    * table and the packing stages. Each turn renders as the public
    * ChatML shape `<|im_start|>role\ncontent<|im_end|>\n`; every
    * ASSISTANT turn contributes one `[mask_start, mask_end)` char span
    * over the rendered text covering its content plus the end marker —
    * the completion region a trainer unmasks (prompts, role headers and
    * the trailing newline stay loss-masked). Every OTHER role — user,
    * system, and `tool` (agentic tool results, the public ChatML
    * tool-use convention) — renders with the same generic turn shape
    * and stays fully loss-masked: tool output is context the model
    * conditions on, not tokens it is trained to produce.
    *
    * Content normalization: LEADING whitespace of every turn's content
    * is stripped before rendering (the HF chat-template `| trim`
    * convention, left side). This is load-bearing for
    * [[chatTokenLossMask]]'s exactness: content that opened with
    * whitespace would fuse with the template's role-header newline into
    * one gpt2 pre-token straddling `mask_start`, and the token mask
    * could no longer cover the completion exactly.
    *
    * Scale shape: per-turn segment lengths are a projection; offsets
    * are ONE running sum windowed per conversation (keyed — no global
    * sort); assembly is one groupBy(conv). Offsets count CHARACTERS
    * (code points, the cross-engine unit) — a downstream tokenizer
    * aligns by slicing the span substrings. Output: (convCol, text,
    * n_turns, mask_spans ARRAY<STRUCT<mask_start, mask_end>>,
    * masked_chars). */
  def renderChatTemplate(
      turns: DataFrame,
      convCol: String,
      turnCol: String,
      roleCol: String,
      contentCol: String): DataFrame = {
    // Java \s class spelled out, so an oracle can replay it in RE2
    val content = regexp_replace(col(contentCol), "^[ \\t\\n\\x0B\\f\\r]+", "")
    val segLen = (lit(ChatStart.length) + length(col(roleCol)) + lit(1) +
      length(content) + lit(ChatEnd.length) + lit(1)).cast("long")
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOff = turns
      .withColumn("__content", content)
      .withColumn("__len", segLen)
      .withColumn("__end", sum(col("__len")).over(w))
      .withColumn("__seg", concat(lit(ChatStart), col(roleCol), lit("\n"),
        col("__content"), lit(ChatEnd), lit("\n")))
      .withColumn("__mask",
        when(col(roleCol) === "assistant", struct(
          col(turnCol).cast("long").as("t"),
          (col("__end") - col("__len") + lit(ChatStart.length) +
            length(col(roleCol)) + lit(1)).cast("long").as("ms"),
          (col("__end") - 1).cast("long").as("me"))))
    withOff.groupBy(col(convCol))
      .agg(
        concat_ws("", transform(
          sort_array(collect_list(struct(col(turnCol).as("t"), col("__seg").as("s")))),
          x => x.getField("s"))).as("text"),
        count(lit(1)).as("n_turns"),
        transform(sort_array(collect_list(col("__mask"))),
          x => struct(x.getField("ms").as("mask_start"),
            x.getField("me").as("mask_end"))).as("mask_spans"),
        coalesce(sum(col("__mask.me") - col("__mask.ms")), lit(0L))
          .as("masked_chars"))
  }

  /** Token-level loss masks for rendered chat — what the trainer
    * actually consumes after [[renderChatTemplate]]: encode the
    * rendered text with a BPE vocabulary in gpt2 mode (pre-tokens
    * carry their whitespace, so [[Bpe.encodeIdsWithOffsets]] char
    * intervals tile the text exactly) and mark every token whose
    * interval lies inside one of the row's mask_spans. The template's
    * markers, role headers and newlines are separate gpt2 pre-tokens
    * and BPE merges never cross pre-token boundaries, so spans align
    * to token boundaries and the mask is EXACT — the masked tokens'
    * surfaces concatenate to precisely the assistant completions.
    * Adds token_ids / token_starts / token_ends / n_tokens /
    * loss_mask / n_loss_tokens; pure scan + higher-order functions,
    * no shuffle. */
  def chatTokenLossMask(
      rendered: DataFrame,
      merges: DataFrame,
      vocabIds: DataFrame): DataFrame =
    Bpe.encodeIdsWithOffsets(rendered, "text", merges, vocabIds, Bpe.Gpt2)
      .withColumn("loss_mask", expr(
        "transform(arrays_zip(token_starts, token_ends), s -> " +
          "exists(mask_spans, sp -> s.token_starts >= sp.mask_start " +
          "AND s.token_ends <= sp.mask_end))"))
      .withColumn("n_loss_tokens",
        size(filter(col("loss_mask"), m => m)).cast("long"))

  def epochShuffle(packed: DataFrame, epoch: Int,
      seqCol: String = "seq_id"): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    val draw = md5(concat_ws(":",
      lit(epoch.toString),
      col("shard").cast("string"),
      col(seqCol).cast("string")))
    // tie-break by the sequence id: md5 collisions are ~impossible, but
    // a deterministic total order must not depend on their absence.
    // `seqCol` defaults to the concat-and-chunk layout's seq_id; pass
    // "bin_id" to shuffle materializeNoSplit's whole-document bins with
    // the same reproducible, append-stable draw.
    val w = Window.partitionBy(col("shard")).orderBy(draw, col(seqCol))
    packed
      .withColumn("epoch", lit(epoch))
      .withColumn("epoch_pos", row_number().over(w).cast("long") - 1L)
  }
}
