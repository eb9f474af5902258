package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, WordPiece}

/** WordPiece training and encoding: the likelihood-score merge choice
  * (hand-computed, including where it diverges from BPE's count choice),
  * greedy longest-match encoding, [UNK] semantics, round-trips,
  * determinism. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("merge order follows the likelihood score, not raw pair counts") {
    // words: "ab" x10, "ad" x5, "cb" x2
    //   symbols: [a,##b] x10, [a,##d] x5, [c,##b] x2
    //   counts: a=15, ##b=12, ##d=5, c=2
    //   scores: (a,##b) 10/(15*12)=0.056  (a,##d) 5/(15*5)=0.067
    //           (c,##b) 2/(2*12)=0.083  <- the LOWEST-count pair wins
    // (BPE would merge (a,##b) first — this is the family discriminator)
    // merge 2: (a,##b) 10/(15*10) ties (a,##d) 5/(15*5); pair_count desc
    // merge 3: (a,##d) — the only pair left
    val df = (Seq.fill(10)("ab") ++ Seq.fill(5)("ad") ++ Seq.fill(2)("cb")).toDF("text")
    val merges = WordPiece.train(df, "text", numMerges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq === Seq(
      (0, "c", "##b", 2L),
      (1, "a", "##b", 10L),
      (2, "a", "##d", 5L)))
  }

  test("greedy longest-match-first encoding against a hand-built vocab") {
    val vocabIds = Seq(
      (WordPiece.UnkToken, 0), ("un", 1), ("##able", 2), ("##ab", 3),
      ("u", 4), ("##n", 5)).toDF("token", "token_id")
    val docs = Seq((1L, "unable unab nun")).toDF("id", "text")
    val enc = WordPiece.encode(docs, "text", vocabIds).head()
    // "unable" -> longest prefix "un", then "##able" (not "##ab" + ...)
    // "unab"   -> "un" + "##ab"
    // "nun"    -> no vocab token matches at position 0 -> [UNK]
    assert(enc.getAs[scala.collection.Seq[String]]("tokens") ===
      Seq("un", "##able", "un", "##ab", WordPiece.UnkToken))
  }

  test("ids round-trip through decode; unseen chars become [UNK]") {
    val corpus = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox was quick",
      "pack my box with five dozen liquor jugs",
      "the dog was not amused").toDF("text")
    val (merges, vocabIds) = WordPiece.trainArtifacts(corpus, "text", numMerges = 40)
    assert(merges.count() > 0)
    val docs = corpus.withColumn("id", monotonically_increasing_id())
      .unionByName(Seq(("the snowman ☃ melted", 99L)).toDF("text", "id"))
    val enc = WordPiece.encodeIds(
      WordPiece.encode(docs, "text", vocabIds), "text", vocabIds)
    val dec = WordPiece.decodeIds(enc, "token_ids", vocabIds).collect()
    dec.foreach { r =>
      val joined = r.getAs[String]("text").trim.split("\\s+").mkString(" ")
      val toks = r.getAs[scala.collection.Seq[String]]("tokens")
      if (r.getAs[Long]("id") == 99L) {
        // "☃" is outside the training alphabet -> that word is [UNK]
        assert(toks.contains(WordPiece.UnkToken), toks.toString)
        assert(r.getAs[scala.collection.Seq[Int]]("token_ids").contains(WordPiece.UnkId))
      } else {
        assert(!toks.contains(WordPiece.UnkToken), toks.toString)
        assert(r.getAs[String]("decoded_text") === joined)
      }
    }
    val audit = WordPiece.encodeAudit(
      WordPiece.encodeIds(WordPiece.encode(docs, "text", vocabIds),
        "text", vocabIds), "id", "text").collect()
    audit.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"), r.toString)
      assert(r.getAs[Boolean]("count_sane"), r.toString)
      assert(r.getAs[Boolean]("has_unk") === (r.getAs[Long]("id") == 99L), r.toString)
    }
  }

  test("training is deterministic and unaffected by partitioning") {
    val words = (1 to 400).map(i => s"w${i % 17}x${i % 5}")
    val a = WordPiece.train(words.toDF("text").repartition(1), "text", 25)
      .collect().toSeq
    val b = WordPiece.train(words.toDF("text").repartition(13), "text", 25)
      .collect().toSeq
    assert(a === b)
  }

  test("surrogate pairs never split: emoji words encode and round-trip") {
    val corpus = Seq("a😀b plain").toDF("text")
    // pair counts are all 1 < minPairCount -> zero merges; encoding is
    // the greedy per-code-point walk
    val (merges, vocabIds) = WordPiece.trainArtifacts(
      corpus, "text", numMerges = 5, minPairCount = 2L)
    assert(merges.count() === 0)
    val enc = WordPiece.encode(
      Seq((1L, "a😀b")).toDF("id", "text"), "text", vocabIds).head()
    assert(enc.getAs[scala.collection.Seq[String]]("tokens") === Seq("a", "##😀", "##b"))
    val dec = WordPiece.decodeIds(
      WordPiece.encodeIds(Seq((1L, "a😀b")).toDF("id", "text"),
        "text", vocabIds), "token_ids", vocabIds).head()
    assert(dec.getAs[String]("decoded_text") === "a😀b")
  }

  test("max_input_chars_per_word counts code points, not UTF-16 units") {
    // 60 astral code points = 120 UTF-16 units: must still encode (the
    // published guard is 100 CHARS = code points); 101 code points -> [UNK]
    val corpus = Seq("😀 a").toDF("text")
    val (_, vocabIds) = WordPiece.trainArtifacts(
      corpus, "text", numMerges = 1, minPairCount = 2L)
    val sixty = "😀" * 60
    val enc60 = WordPiece.encode(
      Seq((1L, sixty)).toDF("id", "text"), "text", vocabIds).head()
    assert(enc60.getAs[scala.collection.Seq[String]]("tokens").length === 60,
      "astral word of 60 code points (120 chars) encodes per code point")
    val over = "😀" * 101
    val encOver = WordPiece.encode(
      Seq((1L, over)).toDF("id", "text"), "text", vocabIds).head()
    assert(encOver.getAs[scala.collection.Seq[String]]("tokens") ===
      Seq(WordPiece.UnkToken))
  }

  test("gpt2 pre-tokenization composes: punctuation stays off the words") {
    val corpus = Seq("Hello, world! it's here.", "world it's here, Hello!")
      .toDF("text")
    val (_, vocabIds) = WordPiece.trainArtifacts(
      corpus, "text", numMerges = 30, preTokenize = Bpe.Gpt2)
    val enc = WordPiece.encodeIds(
      WordPiece.encode(
        Seq((1L, "Hello, it's world!")).toDF("id", "text"),
        "text", vocabIds, preTokenize = Bpe.Gpt2),
      "text", vocabIds, preTokenize = Bpe.Gpt2)
    val audit = WordPiece.encodeAudit(enc, "id", "text", preTokenize = Bpe.Gpt2)
      .head()
    assert(audit.getAs[Boolean]("roundtrip_ok"), audit.toString)
    assert(audit.getAs[Boolean]("count_sane"), audit.toString)
    // gpt2 pre-tokens carry their whitespace -> decode is byte-exact
    val dec = WordPiece.decodeIds(enc, "token_ids", vocabIds,
      preTokenize = Bpe.Gpt2).head()
    assert(dec.getAs[String]("decoded_text") === "Hello, it's world!")
  }

  test("vocab ids are deterministic and [UNK] is id 0") {
    val corpus = Seq("aa ab ba").toDF("text")
    val (m1, v1) = WordPiece.trainArtifacts(corpus, "text", numMerges = 5)
    val (_, v2) = WordPiece.trainArtifacts(corpus, "text", numMerges = 5)
    assert(v1.orderBy("token_id").collect().toSeq ===
      v2.orderBy("token_id").collect().toSeq)
    assert(v1.filter(col("token_id") === 0).head().getString(0) ===
      WordPiece.UnkToken)
    // every merge output is a vocab token
    val vs = v1.select("token").as[String].collect().toSet
    m1.select(concat(col("left"),
        regexp_replace(col("right"), "^##", "")).as("t"))
      .as[String].collect().foreach(t => assert(vs.contains(t), t))
  }
}
