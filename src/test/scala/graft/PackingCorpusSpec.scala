package graft

import graft.dedup.Dedup
import graft.features.Binning
import graft.sampling.Sampling
import graft.text.{Packing, TextAnalysis}
import org.apache.spark.sql.functions._

/** Sequence packing, corpus line dedup, deterministic reservoir, and
  * inverted-index behavior. */
class PackingCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "one two three"),
    (2L, "a b c d e f g"),
    (3L, "x y"),
    (4L, "lorem ipsum dolor sit amet consectetur"),
    (5L, "p q r s t u v w")
  ).toDF("doc_id", "text")

  test("packingPlan: offsets are contiguous per shard, sequence extents consistent") {
    val plan = Packing.packingPlan(docs, "doc_id", "text", ctxTokens = 5, nShards = 2)
      .orderBy("shard", "doc_id").collect()
    // per shard, start_offset of doc i+1 == start_offset + n_tokens of doc i
    plan.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_offset") ==
            a.getAs[Long]("start_offset") + a.getAs[Long]("n_tokens"))
        case _ => ()
      }
      assert(rows.head.getAs[Long]("start_offset") == 0L)
    }
    plan.foreach { r =>
      val (st, n, ctx) = (r.getAs[Long]("start_offset"), r.getAs[Long]("n_tokens"), 5L)
      assert(r.getAs[Long]("first_seq") == st / ctx)
      assert(r.getAs[Long]("last_seq") == (st + n - 1) / ctx)
      assert(r.getAs[Long]("n_seqs") == r.getAs[Long]("last_seq") - r.getAs[Long]("first_seq") + 1)
      assert(r.getAs[Long]("offset_in_seq") == st % ctx)
      assert(r.getAs[Long]("n_seqs") >= 1)
    }
    // shard 0: docs 0,2,4 → 4+7+6=17 tokens → seqs 0..3 at ctx 5
    val s0 = Packing.shardSummary(Packing.packingPlan(docs, "doc_id", "text", 5, 2))
      .filter($"shard" === 0).head()
    assert(s0.getAs[Long]("n_docs") == 3 && s0.getAs[Long]("n_tokens") == 17 &&
      s0.getAs[Long]("n_seqs") == 4)
  }

  test("materializePacked: exact sequences across doc boundaries, short tail, id arrays") {
    import org.apache.spark.sql.functions._
    // one shard (nShards=1), ctx=4. Docs in id order:
    //   doc 0: [a b c]   doc 1: [d e]   doc 2: [f]
    // stream: a b c d | e f  ->  seq 0 = [a,b,c,d], seq 1 = [e,f] (len 2)
    val docs = Seq(
      (0L, Seq("a", "b", "c")),
      (1L, Seq("d", "e")),
      (2L, Seq("f"))).toDF("doc_id", "tokens")
    val packed = graft.text.Packing
      .materializePacked(docs, "doc_id", "tokens", ctxTokens = 4, nShards = 1)
      .orderBy("seq_id")
      .collect()
      .map(r => (r.getLong(1), r.getSeq[String](2), r.getInt(3)))
    assert(packed.toSeq === Seq(
      (0L, Seq("a", "b", "c", "d"), 4),
      (1L, Seq("e", "f"), 2)))
    // int-id tokens pack identically (element type follows the input)
    val ids = Seq((0L, Seq(1, 2, 3)), (1L, Seq(4, 5))).toDF("doc_id", "tokens")
    val packedIds = graft.text.Packing
      .materializePacked(ids, "doc_id", "tokens", ctxTokens = 2, nShards = 1)
      .orderBy("seq_id").collect()
      .map(r => r.getSeq[Int](2))
    assert(packedIds.toSeq === Seq(Seq(1, 2), Seq(3, 4), Seq(5)))
    // sequence ids agree with the PLAN's extents on multi-shard data
    val many = (0L until 20L).map(i => (i, (0 until (i % 5 + 1).toInt).map(j => s"t$j")))
      .toDF("doc_id", "tokens")
    val plan = graft.text.Packing.packingPlanFromCounts(
      many.select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", ctxTokens = 4, nShards = 3)
    val fromPlan = plan.groupBy("shard")
      .agg(max("last_seq").as("m")).orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fromPacked = graft.text.Packing
      .materializePacked(many, "doc_id", "tokens", ctxTokens = 4, nShards = 3)
      .groupBy("shard").agg(max("seq_id").as("m")).orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fromPlan === fromPacked)
  }

  test("materializePackedWithSpans: doc spans cover each sequence exactly") {
    import org.apache.spark.sql.functions._
    // stream (ctx 4): doc0=[a b c], doc1=[d e], doc2=[f]
    //   seq 0 = [a b c d]: spans (0,3,doc0), (3,1,doc1)
    //   seq 1 = [e f]:     spans (0,1,doc1), (1,1,doc2)
    val docs = Seq(
      (0L, Seq("a", "b", "c")),
      (1L, Seq("d", "e")),
      (2L, Seq("f"))).toDF("doc_id", "tokens")
    val out = graft.text.Packing
      .materializePackedWithSpans(docs, "doc_id", "tokens", ctxTokens = 4, nShards = 1)
      .orderBy("seq_id").collect()
    def spans(i: Int) = out(i).getSeq[org.apache.spark.sql.Row](out(i).fieldIndex("doc_spans"))
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(spans(0) === Seq((0, 3, 0L), (3, 1, 1L)))
    assert(spans(1) === Seq((0, 1, 1L), (1, 1, 2L)))
    // spans tile the sequence: lengths sum to seq_len, starts are contiguous
    out.foreach { r =>
      val ss = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("doc_spans"))
        .map(x => (x.getInt(0), x.getInt(1)))
      assert(ss.map(_._2).sum === r.getInt(r.fieldIndex("seq_len")))
      ss.foldLeft(0) { case (expect, (start, len)) =>
        assert(start === expect); start + len
      }
    }
  }

  test("materializePackedWithMasks: masks ride their tokens across sequence boundaries") {
    import org.apache.spark.sql.functions._
    // ctx=4, one shard. doc0 = [a1..a6] with the completion tail masked
    // (last 4 tokens) — the doc WRAPS sequences, so its mask must split
    // across seq 0 and seq 1 exactly where its tokens do. doc1 = [b1 b2]
    // masked [true, false].
    val docs = Seq(
      (0L, Seq("a1", "a2", "a3", "a4", "a5", "a6"),
        Seq(false, false, true, true, true, true)),
      (1L, Seq("b1", "b2"), Seq(true, false)))
      .toDF("doc_id", "tokens", "mask")
    val out = graft.text.Packing
      .materializePackedWithMasks(docs, "doc_id", "tokens", "mask",
        ctxTokens = 4, nShards = 1)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(1),
        r.getAs[scala.collection.Seq[String]]("tokens"),
        r.getAs[scala.collection.Seq[Boolean]]("mask"),
        r.getInt(r.fieldIndex("seq_len"))))
    assert(out.toSeq === Seq(
      (0L, Seq("a1", "a2", "a3", "a4"), Seq(false, false, true, true), 4),
      (1L, Seq("a5", "a6", "b1", "b2"), Seq(true, true, true, false), 4)))
    // the per-sequence loss-normalization count
    val nLoss = graft.text.Packing
      .materializePackedWithMasks(docs, "doc_id", "tokens", "mask",
        ctxTokens = 4, nShards = 1)
      .orderBy("seq_id").select("n_loss_tokens").collect().map(_.getInt(0))
    assert(nLoss.toSeq === Seq(2, 3))
    // the invariant the whole operator exists for: masked tokens across
    // all sequences concatenate to exactly the planted completions
    val maskedStream = out.flatMap { case (_, toks, mask, _) =>
      toks.zip(mask).collect { case (t, true) => t }
    }
    assert(maskedStream.toSeq === Seq("a3", "a4", "a5", "a6", "b1"))
    // a tokens/mask length mismatch raises loudly at execution
    val bad = Seq((0L, Seq("a", "b"), Seq(true))).toDF("doc_id", "tokens", "mask")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      graft.text.Packing.materializePackedWithMasks(
        bad, "doc_id", "tokens", "mask", 4, 1).collect()
    }
    assert(msgs(e).exists(_.contains("length")), msgs(e).mkString("; "))
    // a NULL array raises too — under non-ANSI size(null) = -1 on both
    // sides would pass the length equality and silently shift every
    // later doc's offsets in the shard
    val withNull = Seq(
      (0L, Some(Seq("a")), Some(Seq(true))),
      (1L, None: Option[Seq[String]], None: Option[Seq[Boolean]]),
      (2L, Some(Seq("b")), Some(Seq(false))))
      .toDF("doc_id", "tokens", "mask")
    val e2 = intercept[Exception] {
      graft.text.Packing.materializePackedWithMasks(
        withNull, "doc_id", "tokens", "mask", 4, 1).collect()
    }
    assert(msgs(e2).exists(_.contains("null")), msgs(e2).mkString("; "))
  }

  test("materializeNoSplitWithMasks: truncated doc keeps the prefix of BOTH arrays") {
    import org.apache.spark.sql.functions._
    // ctx=4: doc0 has 6 tokens (oversize -> own bin, truncated to the
    // ctx prefix of tokens AND mask); doc1+doc2 share the next bin
    val docs = Seq(
      (0L, Seq("a1", "a2", "a3", "a4", "a5", "a6"),
        Seq(false, true, false, true, true, true)),
      (1L, Seq("b1", "b2"), Seq(true, false)),
      (2L, Seq("c1"), Seq(true)))
      .toDF("doc_id", "tokens", "mask")
    val out = graft.text.Packing
      .materializeNoSplitWithMasks(docs, "doc_id", "tokens", "mask",
        ctxTokens = 4, nShards = 1)
      .orderBy("bin_id").collect()
    val bins = out.map(r => (r.getLong(1),
      r.getAs[scala.collection.Seq[String]]("tokens"),
      r.getAs[scala.collection.Seq[Boolean]]("mask")))
    assert(bins.toSeq === Seq(
      (0L, Seq("a1", "a2", "a3", "a4"), Seq(false, true, false, true)),
      (1L, Seq("b1", "b2", "c1"), Seq(true, false, true))))
    // doc_spans still tile each bin (the layout metadata is unchanged)
    out.foreach { r =>
      val ss = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("doc_spans"))
        .map(x => (x.getInt(0), x.getInt(1)))
      assert(ss.map(_._2).sum === r.getInt(r.fieldIndex("seq_len")))
    }
    assert(out.map(_.getAs[Int]("n_loss_tokens")).toSeq === Seq(2, 2))
    // bins epoch-shuffle with the same reproducible draw, keyed by bin_id
    val shuffled = graft.text.Packing.epochShuffle(
      graft.text.Packing.materializeNoSplitWithMasks(
        docs, "doc_id", "tokens", "mask", ctxTokens = 4, nShards = 1),
      epoch = 2, seqCol = "bin_id")
    val pos = shuffled.select("bin_id", "epoch_pos")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos.values.toSeq.sorted === Seq(0L, 1L)) // a dense permutation
  }

  test("epochShuffle: deterministic per-shard permutation, epoch-varying, append-stable") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 40L).map(i => (i, (0 until 7).map(j => s"t${i}_$j")))
      .toDF("doc_id", "tokens")
    val packed = graft.text.Packing
      .materializePacked(docs, "doc_id", "tokens", ctxTokens = 5, nShards = 3)
    def order(df: org.apache.spark.sql.DataFrame, epoch: Int): Seq[(Long, Long, Long)] =
      graft.text.Packing.epochShuffle(df, epoch)
        .select("shard", "epoch_pos", "seq_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val e1 = order(packed, 1)
    // reproducible: the same epoch yields the identical order
    assert(e1 === order(packed, 1))
    // per shard, epoch_pos is a 0..n-1 permutation
    e1.groupBy(_._1).foreach { case (shard, rows) =>
      assert(rows.map(_._2).sorted === rows.indices.map(_.toLong),
        s"epoch_pos must be a dense permutation in shard $shard")
    }
    // a different epoch reorders (56 sequences across 3 shards — identical
    // order would mean the epoch is ignored)
    assert(e1.map(_._3) !== order(packed, 2).map(_._3), "epoch must change the order")
    // append-stable: with later sequences added, the RELATIVE order of the
    // original sequences within each shard is unchanged (their draws are
    // pure functions of identity, only ranks of newcomers interleave)
    val more = (40L until 60L).map(i => (i, (0 until 7).map(j => s"t${i}_$j")))
      .toDF("doc_id", "tokens")
    val grown = graft.text.Packing
      .materializePacked(docs.unionByName(more), "doc_id", "tokens", ctxTokens = 5, nShards = 3)
    val oldIds = packed.select("shard", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def relOrder(rows: Seq[(Long, Long, Long)]): Map[Long, Seq[Long]] =
      rows.groupBy(_._1).map { case (s, rs) => s -> rs.sortBy(_._2).map(_._3)
        .filter(id => oldIds.contains((s, id))) }
    assert(relOrder(order(grown, 1)) === relOrder(e1),
      "original sequences must keep their relative epoch order after appends")
  }

  test("globalRowNumber: contiguous total-order ranks without a global window") {
    val d = (1 to 1000).map(i => ((i * 7919) % 1000, i.toLong)).toDF("v", "id")
      .repartition(7) // scrambled input layout
    val ranked = graft.dp.Ranking.globalRowNumber(d, col("v").desc, col("id"))
    val rows = ranked.select("rank", "v", "id").as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 1000L))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 > b._2 || (a._2 == b._2 && a._3 < b._3))
      case _ => ()
    }
    // the plan never funnels through a global window
    assert(!graft.plans.PlanAudit.audit(ranked).exists(_.rule == "GLOBAL_WINDOW"))
  }

  test("tokenBalancedShards: skewed doc lengths balance within a fraction of a percent") {
    // skewed lengths, 10..1000 tokens (100x spread)
    val d = (0 until 200)
      .map(i => (i.toLong, (0 until (10 + (i * i * 37) % 990)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val shards = graft.dp.Ranking.tokenBalancedShards(d, "doc_id", "text", nShards = 4)
    val sums = shards.groupBy("shard").agg(sum("n_tokens").as("t"))
      .select("t").as[Long].collect()
    assert(sums.length == 4)
    assert(sums.max.toDouble / sums.min <= 1.01,
      s"token sums ${sums.toSeq} should balance under the serpentine deal")
    // naive id % n on the same data is an order of magnitude worse
    val naive = d
      .select((col("doc_id") % 4).as("shard"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .groupBy("shard").agg(sum("n").as("t")).select("t").as[Long].collect()
    assert(naive.max.toDouble / naive.min > 1.05)
  }

  test("dedupLines removes corpus-duplicated lines, keeps unique lines in order") {
    val d = Seq(
      (1L, "unique one\nshared footer\nunique two"),
      (2L, "other text\nshared footer"),
      (3L, "third doc\nown line")
    ).toDF("id", "text")
    val out = Dedup.dedupLines(d, "id", "text").orderBy("id").collect()
    assert(out.map(_.getAs[Long]("n_lines")).toSeq == Seq(3L, 2L, 2L))
    assert(out.map(_.getAs[Long]("n_kept")).toSeq == Seq(2L, 1L, 2L))
    assert(out.map(_.getAs[String]("text_deduped")).toSeq ==
      Seq("unique one\nunique two", "other text", "third doc\nown line"))
    // a doc whose every line is boilerplate collapses to empty, not null
    val all = Seq((1L, "x\ny"), (2L, "x\ny")).toDF("id", "text")
    val gone = Dedup.dedupLines(all, "id", "text").orderBy("id").collect()
    assert(gone.forall(_.getAs[String]("text_deduped") == ""))
    assert(gone.forall(_.getAs[Long]("n_kept") == 0L))
  }

  test("dedupParagraphs: blank-line blocks dedup corpus-wide, inner newlines survive") {
    val d = Seq(
      // the shared paragraph CONTAINS a newline: paragraph granularity
      // must keep it intact (line dedup would split it)
      (1L, "unique one\nstill unique\n\nshared footer\nacross docs"),
      (2L, "other text\n\nshared footer\nacross docs"),
      (3L, "only mine")
    ).toDF("id", "text")
    val out = Dedup.dedupParagraphs(d, "id", "text").orderBy("id").collect()
    assert(out.map(_.getAs[Long]("n_paragraphs")).toSeq == Seq(2L, 2L, 1L))
    assert(out.map(_.getAs[Long]("n_kept")).toSeq == Seq(1L, 1L, 1L))
    assert(out.map(_.getAs[String]("text_deduped")).toSeq ==
      Seq("unique one\nstill unique", "other text", "only mine"))
  }

  test("chatTokenLossMask: masked tokens reconstruct exactly the assistant completions") {
    val turns = Seq(
      (1L, 0, "user", "hi there"),
      (1L, 1, "assistant", "hello friend"),
      (1L, 2, "user", "bye"),
      (1L, 3, "assistant", "ok")
    ).toDF("conv_id", "turn_no", "role", "content")
    val rendered = Packing
      .renderChatTemplate(turns, "conv_id", "turn_no", "role", "content")
    val text = rendered.head().getAs[String]("text")
    // train on the rendered text itself (gpt2 mode) so markers merge
    val (m, v) = graft.text.Bpe.trainArtifacts(
      rendered.select(col("text")), "text", numMerges = 80,
      minPairCount = 1, preTokenize = graft.text.Bpe.Gpt2)
    val out = Packing.chatTokenLossMask(rendered, m, v).head()
    val ids = out.getAs[scala.collection.Seq[Int]]("token_ids")
    val st = out.getAs[scala.collection.Seq[Long]]("token_starts")
    val en = out.getAs[scala.collection.Seq[Long]]("token_ends")
    val mask = out.getAs[scala.collection.Seq[Boolean]]("loss_mask")
    assert(ids.length === st.length && st.length === mask.length)
    // intervals tile the text: contiguous, starting at 0, ending at len
    assert(st.head === 0L && en.last === text.length.toLong)
    st.zip(en).sliding(2).foreach { case scala.collection.Seq((_, e1), (s2, _)) =>
      assert(s2 === e1, s"gap at $e1")
    case _ => }
    // the masked region IS the assistant completions, token-exactly
    val maskedText = st.zip(en).zip(mask).collect { case ((s, e), true) =>
      text.substring(s.toInt, e.toInt) }.mkString
    assert(maskedText === "hello friend<|im_end|>" + "ok<|im_end|>")
    assert(out.getAs[Long]("n_loss_tokens") === mask.count(identity).toLong)
    // role headers and markers outside spans stay unmasked
    val unmasked = st.zip(en).zip(mask).collect { case ((s, e), false) =>
      text.substring(s.toInt, e.toInt) }.mkString
    assert(unmasked.contains("assistant") && unmasked.contains("user"))
  }

  test("chatTokenLossMask: leading-whitespace content is normalized, mask stays exact") {
    // un-normalized, "  indented" would fuse the template newline with the
    // content's leading spaces into one gpt2 pre-token straddling
    // mask_start; renderChatTemplate strips leading content whitespace so
    // the mask still covers the completion exactly
    val turns = Seq(
      (1L, 0, "user", "\n prompt"),
      (1L, 1, "assistant", "  indented reply")
    ).toDF("conv_id", "turn_no", "role", "content")
    val rendered = Packing
      .renderChatTemplate(turns, "conv_id", "turn_no", "role", "content")
    val text = rendered.head().getAs[String]("text")
    assert(text ===
      "<|im_start|>user\nprompt<|im_end|>\n" +
        "<|im_start|>assistant\nindented reply<|im_end|>\n")
    val (m, v) = graft.text.Bpe.trainArtifacts(
      rendered.select(col("text")), "text", numMerges = 60,
      minPairCount = 1, preTokenize = graft.text.Bpe.Gpt2)
    val out = Packing.chatTokenLossMask(rendered, m, v).head()
    val st = out.getAs[scala.collection.Seq[Long]]("token_starts")
    val en = out.getAs[scala.collection.Seq[Long]]("token_ends")
    val mask = out.getAs[scala.collection.Seq[Boolean]]("loss_mask")
    val maskedText = st.zip(en).zip(mask).collect { case ((s, e), true) =>
      text.substring(s.toInt, e.toInt) }.mkString
    assert(maskedText === "indented reply<|im_end|>")
    val maskedChars = st.zip(en).zip(mask).collect { case ((s, e), true) => e - s }.sum
    assert(maskedChars === out.getAs[Long]("masked_chars"))
  }

  test("render -> mask -> pack: the full SFT chain keeps masked tokens == completions") {
    // THE trainer-artifact composition: ChatML render, exact token loss
    // masks, then mask-carrying packed materialization at a ctx small
    // enough that conversations wrap sequence boundaries. The invariant
    // that survives the whole chain: decoding the masked slots of every
    // packed sequence, in order, yields exactly the assistant
    // completions of every conversation, in conversation order.
    val turns = Seq(
      (1L, 0, "user", "hi there"),
      (1L, 1, "assistant", "hello friend"),
      (1L, 2, "user", "bye"),
      (1L, 3, "assistant", "ok"),
      (2L, 0, "user", "ping"),
      (2L, 1, "assistant", "pong pong"))
      .toDF("conv_id", "turn_no", "role", "content")
    val rendered = Packing
      .renderChatTemplate(turns, "conv_id", "turn_no", "role", "content")
    val (m, v) = graft.text.Bpe.trainArtifacts(
      rendered.select(col("text")), "text", numMerges = 80,
      minPairCount = 1, preTokenize = graft.text.Bpe.Gpt2)
    val masked = Packing.chatTokenLossMask(rendered, m, v)
      .select(col("conv_id"), col("token_ids"), col("loss_mask"))
    // per-conv masked surfaces, the ground truth (id -> token surface)
    // vocab surfaces carry the BPE end-of-word marker; strip it to decode
    val vocab = v.collect().map(r =>
      r.getAs[Number]("token_id").intValue ->
        r.getAs[String]("token").replace("</w>", "")).toMap
    val wantPerConv = masked.orderBy("conv_id").collect().flatMap { r =>
      r.getAs[scala.collection.Seq[Int]]("token_ids")
        .zip(r.getAs[scala.collection.Seq[Boolean]]("loss_mask"))
        .collect { case (id, true) => vocab(id) }
    }.mkString
    assert(wantPerConv ===
      "hello friend<|im_end|>" + "ok<|im_end|>" + "pong pong<|im_end|>")
    // pack with masks at ctx 8 (both conversations wrap), ONE shard so
    // the stream order is the conv_id order
    val packed = Packing.materializePackedWithMasks(
      masked, "conv_id", "token_ids", "loss_mask", ctxTokens = 8, nShards = 1)
      .orderBy("seq_id").collect()
    assert(packed.length > 2, "fixture must wrap sequence boundaries")
    val fromPacked = packed.flatMap { r =>
      r.getAs[scala.collection.Seq[Int]]("token_ids")
        .zip(r.getAs[scala.collection.Seq[Boolean]]("loss_mask"))
        .collect { case (id, true) => vocab(id) }
    }.mkString
    assert(fromPacked === wantPerConv,
      "masked tokens must survive packing byte-for-byte")
  }

  test("removeDuplicatedSpans: shared span vanishes everywhere, unique prose survives") {
    // k=3: the 4-token phrase "one two three four" is shared by docs 1 and
    // 2 (two overlapping 3-grams -> 4 covered positions in each); doc 3 is
    // untouched; doc 4 is too short to carry any 3-gram
    val d = Seq(
      (1L, "alpha one two three four beta"),
      (2L, "gamma delta one two three four"),
      (3L, "entirely unique prose here"),
      (4L, "hi yo")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.removeDuplicatedSpans(d, "doc_id", "text", k = 3, minDf = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 6L, 2L, "alpha beta"),
      (2L, 6L, 2L, "gamma delta"),
      (3L, 4L, 4L, "entirely unique prose here"),
      (4L, 2L, 2L, "hi yo")))
    // a doc that is ONLY the shared span: everything removed, empty text
    val all = Seq(
      (1L, "one two three"),
      (2L, "one two three")).toDF("doc_id", "text")
    val gone = graft.dedup.Dedup.removeDuplicatedSpans(all, "doc_id", "text", k = 3, minDf = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(2), r.getString(3)))
    assert(gone.toSeq === Seq((0L, ""), (0L, "")))
  }

  test("dupSpanCoverage: exact interval union of cross-document k-gram spans") {
    val k = 4
    val d = Seq(
      // doc 1 & 2 share the 5-token run "a b c d e": starts {0,1} in doc 1
      // → union = min(4, 1-0) + 4 = 5 covered tokens of 6
      (1L, "a b c d e x"),
      (2L, "z z a b c d e"),
      // doc 3: no cross-doc 4-gram
      (3L, "p q r s t u v"),
      // doc 4: shorter than k → zero coverage, still reported
      (4L, "tiny doc")
    ).toDF("id", "text")
    val out = Dedup.dupSpanCoverage(d, "id", "text", k = k, minDf = 2)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(6L, 7L, 7L, 2L))
    assert(out.map(_.getAs[Long]("dup_tokens")).toSeq == Seq(5L, 5L, 0L, 0L))
    assert(out(0).getAs[Double]("dup_fraction") == math.rint(5.0 / 6 * 1e6) / 1e6)
    // a doc made ENTIRELY of a shared run reaches fraction 1.0, never more
    // (overlapping gram intervals must union, not sum)
    val full = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("id", "text")
    val cov = Dedup.dupSpanCoverage(full, "id", "text", k = k, minDf = 2)
      .select("dup_fraction").as[Double].collect()
    assert(cov.toSeq == Seq(1.0, 1.0))
  }

  test("reservoirPerKey: exact k per stratum, deterministic, salt-sensitive") {
    val d = (0L until 200L).map(i => (s"s${i % 4}", i)).toDF("stratum", "id")
    val a = Sampling.reservoirPerKey(d, Seq("stratum"), "id", k = 7, salt = "s1")
    assert(a.groupBy("stratum").count().select("count").as[Long].collect().forall(_ == 7L))
    val again = Sampling.reservoirPerKey(d, Seq("stratum"), "id", k = 7, salt = "s1")
    assert(a.orderBy("stratum", "rank").collect().toSeq ==
      again.orderBy("stratum", "rank").collect().toSeq)
    val other = Sampling.reservoirPerKey(d, Seq("stratum"), "id", k = 7, salt = "s2")
    assert(a.select("id").as[Long].collect().toSet !=
      other.select("id").as[Long].collect().toSet)
    // small stratum: min(k, size) rows survive
    val tiny = Seq(("only", 1L), ("only", 2L)).toDF("stratum", "id")
    assert(Sampling.reservoirPerKey(tiny, Seq("stratum"), "id", 7, "s").count() == 2)
  }

  test("temperatureMixPlan: alpha=1 keeps natural shares, alpha=0 is uniform") {
    val d = (Seq.fill(900)("en") ++ Seq.fill(90)("de") ++ Seq.fill(10)("haw"))
      .zipWithIndex.map { case (l, i) => (l, i.toLong) }.toDF("lang", "id")
    def plan(alpha: Double) = Sampling.temperatureMixPlan(d, "lang", alpha, budget = 100L)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("target_n"), r.getAs[Double]("rate"))).toMap
    val natural = plan(1.0)
    assert(natural("en")._1 == 90L && natural("de")._1 == 9L && natural("haw")._1 == 1L)
    val uniform = plan(0.0)
    assert(uniform.values.map(_._1).toSet == Set(33L)) // 100/3 each
    // 0 < alpha < 1 sits between: tail up-sampled, head down-sampled
    val t = plan(0.5)
    assert(t("haw")._1 > natural("haw")._1 && t("en")._1 < natural("en")._1)
    // a stratum smaller than its target is flagged deficit, rate capped
    val deficit = Sampling.temperatureMixPlan(d, "lang", 0.0, budget = 3000L)
      .filter($"lang" === "haw").head()
    assert(deficit.getAs[Boolean]("deficit") && deficit.getAs[Double]("rate") == 1.0)
  }

  test("unimaxPlan: water-filling by hand — caps bind, leftover redistributes, budget conserved") {
    // tokens a:100 b:200 c:1000, cap 2 epochs -> caps 200/400/2000.
    // Budget 1000: fair share 333 caps a (200); leftover 800 over {b,c}
    // is 400 each — exactly b's cap (boundary: >= means UNcapped), so
    // λ* = 400 and the budget is conserved: 200 + 400 + 400 = 1000.
    val d = ((1 to 10).map(i => (s"d$i", "a", 10L)) ++
      (1 to 20).map(i => (s"e$i", "b", 10L)) ++
      (1 to 100).map(i => (s"f$i", "c", 10L)))
      .toDF("id", "lang", "n_tokens")
    val plan = Sampling.unimaxPlan(d, "lang", "n_tokens",
      budget = 1000L, epochCap = 2.0)
      .collect().map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("corpus_tokens"), r.getAs[Double]("budget_tokens"),
          r.getAs[Double]("rate"), r.getAs[Boolean]("capped")))).toMap
    assert(plan("a") === ((100L, 200.0, 2.0, true)))
    assert(plan("b") === ((200L, 400.0, 2.0, false))) // boundary: cap == λ*
    assert(plan("c") === ((1000L, 400.0, 0.4, false)))
    assert(plan.values.map(_._2).sum === 1000.0) // budget conserved
    // budget above every cap: all capped, plan under-fills honestly
    val all = Sampling.unimaxPlan(d, "lang", "n_tokens",
      budget = 10000L, epochCap = 2.0)
      .collect().map(r => (r.getAs[Double]("budget_tokens"),
        r.getAs[Boolean]("capped")))
    assert(all.forall(_._2) && all.map(_._1).sum === 2600.0)
  }

  test("unimaxSample: full epochs exact, fractional epoch Bernoulli, within-stratum fair") {
    val d = ((1 to 10).map(i => (s"d$i", "a", 10L)) ++
      (1 to 20).map(i => (s"e$i", "b", 10L)) ++
      (1 to 100).map(i => (s"f$i", "c", 10L)))
      .toDF("id", "lang", "n_tokens")
    val out = Sampling.unimaxSample(d, "id", "lang", "n_tokens",
      budget = 1000L, epochCap = 2.0, seed = 1L)
      .select("id", "lang", "epoch").collect()
    val byDoc = out.groupBy(_.getAs[String]("id")).view.mapValues(_.length).toMap
    // rate 2.0 strata: EVERY doc exactly twice (epochs 0 and 1)
    (1 to 10).foreach(i => assert(byDoc(s"d$i") === 2))
    (1 to 20).foreach(i => assert(byDoc(s"e$i") === 2))
    // rate 0.4 stratum: each doc 0 or 1 times, ~40 of 100 total
    val cCounts = (1 to 100).map(i => byDoc.getOrElse(s"f$i", 0))
    assert(cCounts.forall(c => c == 0 || c == 1))
    assert(cCounts.sum > 20 && cCounts.sum < 60, s"got ${cCounts.sum}")
    // deterministic
    val again = Sampling.unimaxSample(d, "id", "lang", "n_tokens",
      budget = 1000L, epochCap = 2.0, seed = 1L)
      .select("id", "lang", "epoch").collect()
    assert(out.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("bigramLogProb: templated text scores low, shuffled soup scores high") {
    val coherent = "the cat sat on the mat"
    val d = Seq(
      (1L, coherent), (2L, coherent), (3L, coherent),     // corpus-frequent bigrams
      (4L, "mat the on sat cat the"),                     // same unigrams, novel bigrams
      (5L, "x")                                           // single token: no bigrams
    ).toDF("id", "text")
    val out = TextAnalysis.bigramLogProb(d, "id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_neg_logprob"))).toMap
    assert(!out.contains(5L))
    assert(out(1L)._1 == 5L)
    assert(out(4L)._2 > out(1L)._2, s"soup ${out(4L)._2} must score above template ${out(1L)._2}")
    // grams derive array-side: no per-doc Window (and its Exchange)
    assert(TextAnalysis.bigramLogProb(d, "id", "text").queryExecution.executedPlan
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      .isEmpty)
  }

  test("trigramLogProb: every stupid-backoff level matches hand arithmetic") {
    // reference "a b c a b c": N=6, c1(a,b,c)=2 each,
    // c2(a,b)=2 (b,c)=2 (c,a)=1, c3(a,b,c)=2 (b,c,a)=1 (c,a,b)=1
    val ref = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b c"),  // seen trigram: p = c3/c2 = 2/2 = 1 -> -ln = 0
      (11L, "a b x"),  // unseen everywhere: p = 0.4*0.4*0.5/6 -> -ln = 4.317488
      (12L, "x b c"),  // backoff to bigram: p = 0.4*c(b,c)/c(b) = 0.4 -> 0.916291
      (13L, "a b")     // under 3 tokens: absent from the output
    ).toDF("doc_id", "text")
    val out = TextAnalysis.trigramLogProb(ref, docs, "doc_id", "text", alpha = 0.4)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_trigrams"),
        r.getAs[Double]("avg_neg_logprob")))
    assert(out.toSeq == Seq(
      (10L, 1L, 0.0), (11L, 1L, 4.317488), (12L, 1L, 0.916291)))
    // grams derive array-side: no per-doc Window (and its Exchange)
    assert(TextAnalysis.trigramLogProb(ref, docs, "doc_id", "text")
      .queryExecution.executedPlan
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      .isEmpty)
  }

  test("ngramLogProb order 5: every backoff level matches hand arithmetic") {
    // reference "a b c d e a b c d e": N=10; c1 all 2;
    // 5-grams: (a b c d e)=2, others 1; 4-grams: (a b c d)=2 (b c d e)=2;
    // 3-grams: (a b c)=(b c d)=(c d e)=2; 2-grams: (a b)=(b c)=(c d)=(d e)=2
    val ref = Seq((0L, "a b c d e a b c d e")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b c d e"), // seen 5-gram: 2/2 = 1 -> 0
      (11L, "b c d e a"), // seen 5-gram: 1/c4(b c d e)=1/2 -> 0.693147
      (12L, "x b c d e"), // 4-gram backoff: 0.4*c4(b c d e)/c3(b c d) = 0.4 -> 0.916291
      (13L, "x y c d e"), // 3-gram: 0.4^2*c3(c d e)/c2(c d) = 0.16 -> 1.832581
      (14L, "x y z d e"), // 2-gram: 0.4^3*c2(d e)/c1(d) = 0.064 -> 2.748872
      (15L, "x y z w e"), // unigram: 0.4^4*c1(e)/N = 0.00512 -> 5.274601
      (16L, "x y z w v"), // unseen floor: 0.4^4*0.5/N = 0.00128 -> 6.660895
      (17L, "a b c d")    // under 5 tokens: absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLogProb(ref, docs, "doc_id", "text",
        order = 5, alpha = 0.4)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_ngrams"),
        r.getAs[Double]("avg_neg_logprob")))
    assert(out.toSeq == Seq(
      (10L, 1L, 0.0), (11L, 1L, 0.693147), (12L, 1L, 0.916291),
      (13L, 1L, 1.832581), (14L, 1L, 2.748872), (15L, 1L, 5.274601),
      (16L, 1L, 6.660895)))
    // grams derive array-side: no per-doc Window (and its Exchange)
    assert(TextAnalysis.ngramLogProb(ref, docs, "doc_id", "text")
      .queryExecution.executedPlan
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      .isEmpty)
  }

  test("groupedBinning: per-group quartiles, boundary and null handling") {
    val d = ((1 to 100).map(i => ("a", i.toDouble)) ++ (1 to 100).map(i => ("b", i * 10.0)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val out = Binning.groupedBinning(d, "g", "v", nBuckets = 4, exact = true)
    // quartiles balance within each group despite 10x different scales
    val counts = out.groupBy("g", "bucket").count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    Seq("a", "b").foreach { g =>
      (0 to 3).foreach { b =>
        assert(math.abs(counts((g, b)) - 25L) <= 1, s"group $g bucket $b: ${counts((g, b))}")
      }
    }
    // null values get a null bucket, not bucket 0
    val withNull = d.unionByName(Seq((999L, "a", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "g", "v"))
    val nb = Binning.groupedBinning(withNull, "g", "v", 4, exact = true)
      .filter($"id" === 999L).select("bucket").head()
    assert(nb.isNullAt(0))
    // null GROUP KEY with a non-null value also gets a null bucket — the
    // left join yields __edges = null, and with legacy sizeOfNull a raw
    // size(filter(null)) would be -1, not null
    val withNullKey = d.unionByName(
      Seq((998L, null.asInstanceOf[String], 42.0)).toDF("id", "g", "v"))
    val nk = Binning.groupedBinning(withNullKey, "g", "v", 4, exact = true)
      .filter($"id" === 998L).select("bucket").head()
    assert(nk.isNullAt(0), s"null key must give null bucket, got $nk")
  }

  test("invertedIndex: capped ascending postings, df counts distinct docs") {
    val d = Seq(
      (10L, "spark spark engine"),
      (11L, "spark catalyst"),
      (12L, "spark rows"),
      (13L, "spark plan engine")
    ).toDF("id", "text")
    val idx = TextAnalysis.invertedIndex(d, "id", "text", minLength = 2, minDf = 1, maxPostings = 2)
    val m = idx.collect().map(r =>
      r.getAs[String]("token") -> (r.getAs[Long]("df"), r.getAs[Seq[Long]]("postings"))).toMap
    assert(m("spark") == (4L, Seq(10L, 11L)))   // df counts all, postings capped at 2
    assert(m("engine") == (2L, Seq(10L, 13L)))
    assert(m("catalyst") == (1L, Seq(11L)))
    assert(!m.contains("a"))
  }

  test("binPackNoSplit: hand-computed next-fit incl. zero, oversize, exact-fit docs") {
    // ctx=10, one shard. Fold: (0,4)->bin0@0, (1,3)->bin0@4, (2,10) exact
    // fit -> bin1@0, (3,0) -> no bin, (4,12) oversize -> bin2@0 truncated,
    // (5,2)->bin3@0, (6,5)->bin3@2, (7,4) overflows -> bin4@0, (8,1)->bin4@4
    val counts = Seq(
      (0L, 4L), (1L, 3L), (2L, 10L), (3L, 0L), (4L, 12L),
      (5L, 2L), (6L, 5L), (7L, 4L), (8L, 1L)).toDF("doc_id", "n_tokens")
    val plan = Packing.binPackNoSplit(counts, "doc_id", "n_tokens",
      ctxTokens = 10, nShards = 1)
    val rows = plan.orderBy("doc_id").collect().map { r =>
      (r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("bin_id")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("offset_in_bin")).map(_.toLong),
        r.getAs[Boolean]("truncated"))
    }
    assert(rows.toSeq == Seq(
      (0L, Some(0L), Some(0L), false),
      (1L, Some(0L), Some(4L), false),
      (2L, Some(1L), Some(0L), false),
      (3L, None, None, false),
      (4L, Some(2L), Some(0L), true),
      (5L, Some(3L), Some(0L), false),
      (6L, Some(3L), Some(2L), false),
      (7L, Some(4L), Some(0L), false),
      (8L, Some(4L), Some(4L), false)))
    val s = Packing.binPackSummary(plan, 10).head()
    assert(s.getAs[Long]("n_docs") == 9L)
    assert(s.getAs[Long]("n_bins") == 5L)
    assert(s.getAs[Long]("packed_tokens") == 39L)   // 4+3+10+10+2+5+4+1
    assert(s.getAs[Long]("truncated_tokens") == 2L) // 12 - 10
    assert(s.getAs[Long]("padding_tokens") == 11L)  // 5*10 - 39
    assert(math.abs(s.getAs[Double]("efficiency") - 0.78) < 1e-9)
  }

  test("materializeNoSplit: whole-doc bins, truncated prefix, spans tile each bin") {
    // ctx=5, one shard: docs 0+1 fill bin0; doc 2 (7 toks) is truncated
    // alone in bin1; docs 4+5 fill bin2; doc 3 is empty -> no bin
    val docs = Seq(
      (0L, Seq("a", "b", "c")),
      (1L, Seq("d", "e")),
      (2L, Seq("f", "g", "h", "i", "j", "k", "l")),
      (3L, Seq.empty[String]),
      (4L, Seq("m", "n", "o", "p")),
      (5L, Seq("q"))).toDF("doc_id", "tokens")
    val out = Packing.materializeNoSplit(docs, "doc_id", "tokens", ctxTokens = 5, nShards = 1)
      .orderBy("bin_id").collect()
    assert(out.length == 3)
    val toks = out.map(_.getAs[scala.collection.Seq[String]]("tokens").mkString(" "))
    assert(toks.toSeq == Seq("a b c d e", "f g h i j", "m n o p q"))
    assert(out.map(_.getAs[Int]("seq_len")).toSeq == Seq(5, 5, 5))
    val spans = out.map(_.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doc_spans")
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))))
    assert(spans(0).toSeq == Seq((0, 3, 0L), (3, 2, 1L)))
    assert(spans(1).toSeq == Seq((0, 5, 2L))) // truncated doc: capped span
    assert(spans(2).toSeq == Seq((0, 4, 4L), (4, 1, 5L)))
    // spans tile each bin exactly: lengths sum to seq_len, starts chain
    out.zip(spans).foreach { case (row, sp) =>
      assert(sp.map(_._2).sum == row.getAs[Int]("seq_len"))
      sp.foldLeft(0) { case (expect, (st, len, _)) =>
        assert(st == expect); st + len
      }
    }
  }

  test("binPackNoSplit: partition-invariant, bins dense, capacity never exceeded") {
    val counts = docs.select($"doc_id",
      TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    val a = Packing.binPackNoSplit(counts, "doc_id", "n_tokens", 8, 2)
      .orderBy("shard", "doc_id").collect().toSeq
    val b = Packing.binPackNoSplit(counts.repartition(7), "doc_id", "n_tokens", 8, 2)
      .orderBy("shard", "doc_id").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    // per (shard, bin): offsets tile the bin prefix exactly and stay <= ctx
    a.groupBy(r => (r.getLong(0), r.getAs[java.lang.Long]("bin_id")))
      .foreach { case ((_, bin), rs) =>
        if (bin != null) {
          val sorted = rs.sortBy(_.getAs[Long]("offset_in_bin"))
          var expect = 0L
          sorted.foreach { r =>
            assert(r.getAs[Long]("offset_in_bin") == expect)
            expect += math.min(r.getAs[Long]("n_tokens"), 8L)
          }
          assert(expect <= 8L)
        }
      }
    // bins are dense 0..max per shard
    a.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val bins = rs.flatMap(r => Option(r.getAs[java.lang.Long]("bin_id")).map(_.toLong))
        .distinct.sorted
      assert(bins == (0L until bins.length.toLong))
    }
  }

  test("interleavedPlan: hand-computed media slots, clamping, truncation drop") {
    // ctx=20, one shard. doc 1: 10 text tokens + a1(pos 2, patch 4) +
    // a2(pos 2, patch 3; same position — asset-id tie-break puts it after
    // a1, shifted by a1's patches). doc 2: 5 text + b1 at pos 99 (clamps
    // to 5), patch 10 — eff 15 opens bin 1 (17+15 > 20). doc 3: 30 text +
    // c1(pos 28, patch 5): eff 35 >= ctx — own bin, truncated, and c1's
    // span [28, 33) falls outside the 20-slot window -> dropped.
    val d = Seq((1L, 10L), (2L, 5L), (3L, 30L)).toDF("doc_id", "n_tokens")
    val a = Seq(
      (1L, 11L, 2L, 4L), (1L, 12L, 2L, 3L),
      (2L, 21L, 99L, 10L), (3L, 31L, 28L, 5L)
    ).toDF("doc_id", "asset_id", "position", "patch_tokens")
    val out = Packing.interleavedPlan(d, a, "doc_id", "n_tokens",
        "asset_id", "position", "patch_tokens", ctxTokens = 20, nShards = 1)
      .orderBy("bin_id", "start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.toSeq === Seq(
      (0L, 0L, 1L, 11L, 2L, 4L, false),
      (0L, 0L, 1L, 12L, 6L, 3L, false),
      (0L, 1L, 2L, 21L, 5L, 10L, false),
      (0L, 2L, 3L, 31L, 28L, 5L, true)))
    // no two placed (non-dropped) spans overlap within a bin, and every
    // placed span fits inside [doc offset, doc offset + capped len)
    val placed = out.filter(!_._7)
    placed.groupBy(t => (t._1, t._2)).foreach { case (_, rs) =>
      rs.sortBy(_._5).sliding(2).foreach {
        case Array(x, y) => assert(x._5 + x._6 <= y._5, s"overlap: $x $y")
        case _ =>
      }
    }
  }

  test("materializeInterleaved: image tokens fill patch slots, text shifts, dropped spans vanish") {
    val IMG = 9999
    val d = Seq(
      (1L, (101 to 110).toArray), // + 7 patch slots -> eff 17
      (2L, (201 to 205).toArray), // + 10 -> eff 15, opens bin 1
      (3L, (301 to 330).toArray)  // eff 35 >= 20 -> own bin, c1 dropped
    ).toDF("doc_id", "token_ids")
    val a = Seq(
      (1L, 11L, 2L, 4L), (1L, 12L, 2L, 3L),
      (2L, 21L, 99L, 10L), (3L, 31L, 28L, 5L)
    ).toDF("doc_id", "asset_id", "position", "patch_tokens")
    val out = Packing.materializeInterleaved(d, a, "doc_id", "token_ids",
        "asset_id", "position", "patch_tokens", ctxTokens = 20, nShards = 1,
        imageTokenId = IMG)
      .orderBy("bin_id").collect()
    assert(out.length === 3)
    def toks(i: Int) = out(i).getAs[scala.collection.Seq[Int]]("token_ids").toSeq
    // bin 0 = doc 1: text[0,1], a1's 4 patches, a2's 3, text[2..9]
    assert(toks(0) === Seq(101, 102) ++ Seq.fill(7)(IMG) ++ (103 to 110))
    // bin 1 = doc 2: 5 text tokens then b1's 10 patches (pos clamped to 5)
    assert(toks(1) === (201 to 205) ++ Seq.fill(10)(IMG))
    // bin 2 = doc 3 truncated at ctx: first 20 text tokens, no media
    assert(toks(2) === (301 to 320))
    assert(out(2).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("media_spans").isEmpty)
    // media spans align with the IMG runs
    val spans0 = out(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("media_spans").toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(spans0 === Seq((2, 4, 11L), (6, 3, 12L)))
    spans0.foreach { case (st, len, _) =>
      assert(toks(0).slice(st, st + len).forall(_ == IMG)) }
  }

  test("materializeInterleaved: trailing hole from a dropped asset pad-fills to the plan length") {
    val IMG = 9999
    val PAD = -1
    // 15 text tokens + an asset at the text end (pos 15, 10 patches):
    // eff 25, ctx 20 -> window 20, asset span [15,25) does not fit ->
    // dropped -> slots 15..19 have NO content. seq_len must still be 20
    // (the plan's window), with the tail pad-filled — doc_spans claims
    // len 20 and a loader slicing by it must not read past the array.
    val d = Seq((1L, (101 to 115).toArray)).toDF("doc_id", "token_ids")
    val a = Seq((1L, 11L, 15L, 10L)).toDF("doc_id", "asset_id", "position", "patch_tokens")
    val out = Packing.materializeInterleaved(d, a, "doc_id", "token_ids",
        "asset_id", "position", "patch_tokens", ctxTokens = 20, nShards = 1,
        imageTokenId = IMG, padTokenId = PAD)
      .collect()
    assert(out.length === 1)
    val toks = out(0).getAs[scala.collection.Seq[Int]]("token_ids").toSeq
    assert(out(0).getAs[Int]("seq_len") === 20)
    assert(toks === (101 to 115) ++ Seq.fill(5)(PAD))
    val docSpans = out(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doc_spans").toSeq
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(docSpans === Seq((0, 20))) // spans tile seq_len exactly
    assert(out(0).getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("media_spans").isEmpty)
  }

  test("materializeInterleavedWithMasks: text bits survive shifts/truncation; patch+pad slots masked") {
    val IMG = -1
    val PAD = -2
    val d = Seq(
      // doc 1: 10 text tokens, bits = token is even; two assets shift the tail
      (1L, (101 to 110).toArray, (101 to 110).map(_ % 2 == 0).toArray),
      // doc 2: all-true bits, asset appended at clamped pos
      (2L, (201 to 205).toArray, Array.fill(5)(true)),
      // doc 3: 30 tokens all-true, eff 35 >= ctx 20 -> truncated to its
      // first 20 tokens (the asset at pos 28 is dropped) — the kept
      // prefix keeps exactly its own 20 bits
      (3L, (301 to 330).toArray, Array.fill(30)(true)),
      // doc 4: the dropped-asset HOLE case — 15 text tokens (all true) +
      // a 10-patch asset at pos 15: eff 25 > ctx -> own bin, asset
      // dropped, slots 15..19 pad-fill and MUST be masked out
      (4L, (401 to 415).toArray, Array.fill(15)(true))
    ).toDF("doc_id", "token_ids", "bits")
    val a = Seq(
      (1L, 11L, 2L, 4L), (1L, 12L, 2L, 3L),
      (2L, 21L, 99L, 10L), (3L, 31L, 28L, 5L), (4L, 41L, 15L, 10L)
    ).toDF("doc_id", "asset_id", "position", "patch_tokens")
    val out = Packing.materializeInterleavedWithMasks(d, a, "doc_id",
        "token_ids", "bits", "asset_id", "position", "patch_tokens",
        ctxTokens = 20, nShards = 1, imageTokenId = IMG, padTokenId = PAD)
      .orderBy("bin_id").collect()
    assert(out.length === 4)
    def toks(i: Int) = out(i).getAs[scala.collection.Seq[Int]]("token_ids").toSeq
    def mask(i: Int) = out(i).getAs[scala.collection.Seq[Boolean]]("loss_mask").toSeq
    // bin 0 = doc 1: text[0,1], 7 IMG slots, text[2..9]; bits ride along
    assert(toks(0) === Seq(101, 102) ++ Seq.fill(7)(IMG) ++ (103 to 110))
    assert(mask(0) === Seq(false, true) ++ Seq.fill(7)(false) ++
      (103 to 110).map(_ % 2 == 0))
    assert(out(0).getAs[Int]("n_loss_tokens") === 5)
    // bin 1 = doc 2: 5 true text bits then 10 masked patch slots
    assert(mask(1) === Seq.fill(5)(true) ++ Seq.fill(10)(false))
    // bin 2 = doc 3 truncated: kept prefix keeps its own bits
    assert(toks(2) === (301 to 320))
    assert(mask(2) === Seq.fill(20)(true))
    // bin 3 = doc 4: 15 true bits, then the dropped asset's 5-slot hole
    // pad-fills and is masked out
    assert(toks(3) === (401 to 415) ++ Seq.fill(5)(PAD))
    assert(mask(3) === Seq.fill(15)(true) ++ Seq.fill(5)(false))
    assert(out(3).getAs[Int]("n_loss_tokens") === 15)
    // loss never lands on a non-text slot, in any bin
    (0 to 3).foreach { i =>
      toks(i).zip(mask(i)).foreach { case (t, m) =>
        if (t == IMG || t == PAD) assert(!m, s"bin $i: loss on slot token $t") } }
  }

  test("materializePackedWithMasksAndSpans: one pass yields aligned masks AND doc spans") {
    val d = Seq(
      (1L, Array("a", "b", "c", "d"), Array(true, false, true, false)),
      (2L, Array("e", "f", "g"), Array(false, true, true))
    ).toDF("doc_id", "toks", "bits")
    val out = Packing.materializePackedWithMasksAndSpans(
        d, "doc_id", "toks", "bits", ctxTokens = 5, nShards = 1)
      .orderBy("seq_id").collect()
    assert(out.length === 2)
    def s(i: Int) = out(i).getAs[scala.collection.Seq[String]]("toks").toSeq
    def m(i: Int) = out(i).getAs[scala.collection.Seq[Boolean]]("bits").toSeq
    def spans(i: Int) = out(i)
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("doc_spans").toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // seq 0: doc1 fully + doc2's first token (doc2 wraps the boundary)
    assert(s(0) === Seq("a", "b", "c", "d", "e"))
    assert(m(0) === Seq(true, false, true, false, false))
    assert(out(0).getAs[Int]("n_loss_tokens") === 2)
    assert(spans(0) === Seq((0, 4, 1L), (4, 1, 2L)))
    // seq 1: doc2's wrapped tail keeps its own bits
    assert(s(1) === Seq("f", "g"))
    assert(m(1) === Seq(true, true))
    assert(out(1).getAs[Int]("n_loss_tokens") === 2)
    assert(spans(1) === Seq((0, 2, 2L)))
  }

  test("renderChatTemplate: hand-computed offsets, spans and mask arithmetic") {
    val turns = Seq(
      (1L, 0, "user", "hi"),
      (1L, 1, "assistant", "hello"),
      (1L, 2, "user", "bye"),
      (1L, 3, "assistant", "ok"),
      (2L, 0, "user", "solo")
    ).toDF("conv_id", "turn_no", "role", "content")
    val out = Packing
      .renderChatTemplate(turns, "conv_id", "turn_no", "role", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    val c1 = out(1L)
    val expected =
      "<|im_start|>user\nhi<|im_end|>\n" +
        "<|im_start|>assistant\nhello<|im_end|>\n" +
        "<|im_start|>user\nbye<|im_end|>\n" +
        "<|im_start|>assistant\nok<|im_end|>\n"
    assert(c1.getAs[String]("text") === expected)
    assert(c1.getAs[Long]("n_turns") === 4)
    val spans = c1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("mask_spans")
      .map(r => (r.getLong(0), r.getLong(1)))
    // turn 0 len = 12+4+1+2+10+1 = 30; assistant turn 1 (len 38) starts
    // at 30, content starts 30+12+9+1 = 52, span covers
    // "hello<|im_end|>" -> 67; turn 2 len = 31 -> turn 3 starts
    // 30+38+31 = 99, content at 99+22 = 121, covers "ok<|im_end|>" -> 133
    assert(spans === Seq((52L, 67L), (121L, 133L)))
    // every span's substring is content + end marker, exactly
    assert(expected.substring(52, 67) === "hello<|im_end|>")
    assert(expected.substring(121, 133) === "ok<|im_end|>")
    assert(c1.getAs[Long]("masked_chars") === (67 - 52) + (133 - 121))
    // a conversation with no assistant turn: empty spans, zero masked
    val c2 = out(2L)
    assert(c2.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("mask_spans").isEmpty)
    assert(c2.getAs[Long]("masked_chars") === 0L)
  }

  test("conversationStats: shape flags, system exemption, char mass split") {
    val turns = Seq(
      // conv 1: system + clean user/assistant/user/assistant
      (1L, -1, "system", "sys"),
      (1L, 0, "user", "hi"),           // 2 chars
      (1L, 1, "assistant", "hello"),   // 5
      (1L, 2, "user", "ok"),           // 2
      (1L, 3, "assistant", "bye"),     // 3
      // conv 2: double-user alternation break, ends with user
      (2L, 0, "user", "aa"),
      (2L, 1, "user", "bb"),
      (2L, 2, "assistant", "cc"),
      (2L, 3, "user", "dd"),
      // conv 3: assistant-first
      (3L, 0, "assistant", "x"))
      .toDF("conv_id", "turn_no", "role", "content")
    val out = Packing.conversationStats(turns, "conv_id", "turn_no", "role", "content")
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    val c1 = out(1L)
    assert(c1.getAs[Long]("n_turns") === 5 && c1.getAs[Long]("n_system") === 1)
    assert(c1.getAs[Long]("n_user") === 2 && c1.getAs[Long]("n_assistant") === 2)
    assert(c1.getAs[Boolean]("starts_with_user"))   // system turn exempt
    assert(c1.getAs[Boolean]("ends_with_assistant"))
    assert(c1.getAs[Boolean]("strict_alternation"))
    assert(c1.getAs[Long]("total_chars") === 3 + 2 + 5 + 2 + 3)
    assert(c1.getAs[Double]("assistant_char_frac") === 0.533333) // round(8/15, 6)
    val c2 = out(2L)
    assert(!c2.getAs[Boolean]("strict_alternation"))
    assert(!c2.getAs[Boolean]("ends_with_assistant"))
    assert(c2.getAs[Boolean]("starts_with_user"))
    val c3 = out(3L)
    assert(!c3.getAs[Boolean]("starts_with_user"))
    assert(c3.getAs[Boolean]("ends_with_assistant"))
  }

  test("conversationStats: tool turns counted but exempt from the shape checks") {
    // Agentic traces: the exemption removes tool turns from the
    // alternation check without laundering real breaks. Conv 1
    // (u,a,t,t,a) reads u,a,a tool-free — a REAL break, still flagged;
    // conv 2 (u,a,t,u,a) reads u,a,u,a — clean.
    val turns = Seq(
      // conv 1: tool turns BETWEEN two assistant turns -> with tools
      // exempt, the remaining sequence u,a,a has a REAL break
      (1L, 0, "user", "q"),
      (1L, 1, "assistant", "call"),
      (1L, 2, "tool", "{\"r\":1}"),
      (1L, 3, "tool", "{\"r\":2}"),
      (1L, 4, "assistant", "answer"),
      // conv 2: tool turn between assistant and USER -> tool-free
      // sequence u,a,u,a stays strictly alternating
      (2L, 0, "user", "q"),
      (2L, 1, "assistant", "call"),
      (2L, 2, "tool", "{\"r\":3}"),
      (2L, 3, "user", "more"),
      (2L, 4, "assistant", "done"),
      // conv 3: truncated agentic trace — cut off after the tool result,
      // no final assistant answer
      (3L, 0, "user", "q"),
      (3L, 1, "assistant", "call"),
      (3L, 2, "tool", "{\"r\":4}"))
      .toDF("conv_id", "turn_no", "role", "content")
    val out = Packing.conversationStats(turns, "conv_id", "turn_no", "role", "content")
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    val c1 = out(1L)
    assert(c1.getAs[Long]("n_tool") === 2 && c1.getAs[Long]("n_turns") === 5)
    assert(c1.getAs[Boolean]("starts_with_user"))
    assert(c1.getAs[Boolean]("ends_with_assistant")) // tool not the last non-exempt
    // assistant->assistant with only tool turns between IS still flagged:
    // the exemption removes tool turns from the check, it does not
    // launder a missing user turn
    assert(!c1.getAs[Boolean]("strict_alternation"))
    assert(!c1.getAs[Boolean]("dangling_tool")) // real last turn is assistant
    assert(c1.getAs[Long]("total_chars") ===
      1 + 4 + 7 + 7 + 6) // tool chars count toward the mass
    val c2 = out(2L)
    assert(c2.getAs[Long]("n_tool") === 1)
    assert(c2.getAs[Boolean]("strict_alternation")) // u,a,u,a after exemption
    assert(c2.getAs[Boolean]("ends_with_assistant"))
    assert(!c2.getAs[Boolean]("dangling_tool"))
    // the truncation canary: the exemption makes ends_with_assistant
    // TRUE for conv 3 (u,a tool-free), so dangling_tool is what
    // catches the unanswered tool result
    val c3 = out(3L)
    assert(c3.getAs[Boolean]("ends_with_assistant"))
    assert(c3.getAs[Boolean]("dangling_tool"))
  }

  test("renderChatTemplate: tool turns render generically and stay unmasked") {
    val turns = Seq(
      (1L, 0, "user", "q"),
      (1L, 1, "assistant", "call"),
      (1L, 2, "tool", "{\"r\":1}"),
      (1L, 3, "assistant", "answer"))
      .toDF("conv_id", "turn_no", "role", "content")
    val r = Packing.renderChatTemplate(turns, "conv_id", "turn_no", "role", "content")
      .head()
    val text = r.getAs[String]("text")
    assert(text ===
      "<|im_start|>user\nq<|im_end|>\n" +
      "<|im_start|>assistant\ncall<|im_end|>\n" +
      "<|im_start|>tool\n{\"r\":1}<|im_end|>\n" +
      "<|im_start|>assistant\nanswer<|im_end|>\n")
    val spans = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("mask_spans"))
      .map(x => (x.getLong(0), x.getLong(1)))
    // exactly the two assistant completions; the tool turn contributes
    // no span, and the second span sits AFTER the tool segment
    assert(spans.length === 2)
    spans.zip(Seq("call<|im_end|>", "answer<|im_end|>")).foreach {
      case ((s, e), want) => assert(text.substring(s.toInt, e.toInt) === want)
    }
  }
}
