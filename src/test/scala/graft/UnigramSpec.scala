package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, Unigram}

/** Unigram-LM tokenizer: EM learns the obvious subword, Viterbi
  * segmentations are exact covers, determinism, vocab sizing, unk
  * fallback. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("EM learns the dominant subword and Viterbi uses it") {
    // "abab" x100 + "ab" x50: the piece "ab" carries far more expected
    // mass than any other multi-char candidate, so it must survive
    // pruning and Viterbi must segment "abab" as [ab, ab], not chars
    val df = (Seq.fill(100)("abab") ++ Seq.fill(50)("ab")).toDF("text")
    val pieces = Unigram.train(df, "text", vocabSize = 4)
    val kept = pieces.filter(col("log_prob").isNotNull)
      .select("piece").as[String].collect().toSet
    assert(kept.contains("ab"), s"expected 'ab' in vocab, got $kept")
    assert(kept.contains("a") && kept.contains("b"),
      "single characters must always survive pruning")
    val enc = Unigram.encode(Seq("abab").toDF("text"), "text", pieces)
      .select("pieces").as[Seq[String]].head
    assert(enc === Seq("ab", "ab") || enc === Seq("abab"),
      s"Viterbi should use learned pieces, got $enc")
  }

  test("round-trip exactness and count sanity on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pieces = Unigram.train(docs, "text", vocabSize = 256, maxWords = 2000)
    val audit = Unigram.encodeAudit(
      Unigram.encode(docs, "text", pieces), "doc_id", "text")
    val bad = audit.filter(!col("roundtrip_ok") || !col("count_sane")).count()
    assert(bad === 0L, s"$bad documents failed the encode invariants")
    // id encoding: same piece count, ids within [0, vocab)
    val maxId = pieces.agg(max(col("piece_id"))).head.getInt(0)
    val idsOk = Unigram.encodeIds(docs, "text", pieces)
      .select(explode(col("piece_ids")).as("i"))
      .filter(col("i") < 0 || col("i") > maxId).count()
    assert(idsOk === 0L)
  }

  test("training is deterministic and partition-invariant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("piece_id").collect().map(_.toString).toSeq
    val a = rows(Unigram.train(docs, "text", vocabSize = 64, maxWords = 500))
    val b = rows(Unigram.train(docs.repartition(7), "text", vocabSize = 64,
      maxWords = 500))
    assert(a === b, "training must not depend on partition layout")
  }

  test("vocabulary is sized to target; unseen characters byte-fall-back, never unk") {
    val df = Seq.fill(20)("hello world").toDF("text")
    val pieces = Unigram.train(df, "text", vocabSize = 12)
    val real = pieces.filter(col("log_prob").isNotNull).count()
    // chars: h e l o w r d (7) + space-split words' chars only; target 12
    assert(real <= 12L, s"vocab $real exceeds target")
    assert(pieces.filter(col("piece") === Bpe.UnkToken).count() === 1L)
    // byte pieces are probability-less markers after the real pieces
    assert(pieces.filter(col("piece") === "<0x41>").count() === 1L)
    // a character never seen in training segments as a fallback piece and
    // still round-trips as text
    val enc = Unigram.encode(Seq("hexxxllo").toDF("text"), "text", pieces)
      .select(concat_ws("", col("pieces"))).as[String].head
    assert(enc === "hexxxllo")
    // unseen chars encode to their UTF-8 byte-piece ids — zero unk
    val ids = Unigram.encodeIds(Seq("zzz").toDF("text"), "text", pieces)
      .select("piece_ids").as[Seq[Int]].head
    assert(ids.nonEmpty && ids.forall(_ != Bpe.UnkId),
      s"unseen chars must byte-fall-back, got unk in $ids")
  }

  test("byte fallback: arbitrary unicode round-trips through ids with zero unk") {
    val train = Seq.fill(20)("the quick brown fox").toDF("text")
    val pieces = Unigram.train(train, "text", vocabSize = 16)
    // CJK, emoji (surrogate pair), accents, cyrillic — none in training
    val wild = Seq("日本語テキスト", "café 😀 ok", "привет the",
      "mixed日本and🍕slices").toDF("text")
    val enc = Unigram.encodeIds(wild, "text", pieces)
    val noUnk = enc.select("piece_ids").as[Seq[Int]].collect()
    assert(noUnk.forall(ids => ids.nonEmpty && ids.forall(_ != Bpe.UnkId)))
    // decode = exact word concatenation (no sentinel -> no spaces)
    val rt = Unigram.decodeIds(enc, "piece_ids", pieces)
      .select(col("decoded_text"),
        concat_ws("", filter(split(col("text"), "\\s+"), w => length(w) > 0)).as("want"))
      .as[(String, String)].collect()
    rt.foreach { case (got, want) => assert(got === want) }
  }

  test("gpt2 pre-tokenization: punctuation segments apart; decode is byte-exact") {
    val train = Seq.fill(15)("the end. it's fine! ok?").toDF("text")
    val pieces = Unigram.train(train, "text", vocabSize = 40, preTokenize = Bpe.Gpt2)
    // gpt2 pre-tokens carry their whitespace, so the plain byte
    // concatenation decode reproduces the input EXACTLY — including the
    // doubled space and the unicode it never trained on
    val wild = Seq("the end... it's  reálly fine!?").toDF("text")
    val enc = Unigram.encodeIds(wild, "text", pieces, preTokenize = Bpe.Gpt2)
    assert(enc.select("piece_ids").as[Seq[Int]].head.forall(_ != Bpe.UnkId))
    val rt = Unigram.decodeIds(enc, "piece_ids", pieces)
      .select("decoded_text").as[String].head
    assert(rt === "the end... it's  reálly fine!?", s"got [$rt]")
    // audit flags hold under the gpt2 segmentation
    val audit = Unigram.encodeAudit(
        Unigram.encode(enc, "text", pieces, preTokenize = Bpe.Gpt2),
        "text", "text", preTokenize = Bpe.Gpt2)
      .select("roundtrip_ok", "count_sane").as[(Boolean, Boolean)].head
    assert(audit === ((true, true)))
  }
}
