package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe

/** BPE training and encoding: hand-computed merges, lossless round-trip,
  * determinism, caps and edge cases. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merge order matches the hand-computed BPE run") {
    // words: "ab" x3, "abc" x2  ->  symbols: [a, b</w>] x3, [a, b, c</w>] x2
    // pair counts: (a,b</w>)=3, (a,b)=2, (b,c</w>)=2
    // merge 1: (a, b</w>) count 3
    // then: [ab</w>] x3, [a, b, c</w>] x2 -> pairs (a,b)=2, (b,c</w>)=2
    // merge 2: (a, b) — tie with (b,c</w>) broken by left asc
    // then: [ab, c</w>] x2 -> merge 3: (ab, c</w>) count 2
    val df = (Seq.fill(3)("ab") ++ Seq.fill(2)("abc")).toDF("text")
    val merges = Bpe.train(df, "text", numMerges = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === Seq(
      (0, "a", "b</w>", 3L),
      (1, "a", "b", 2L),
      (2, "ab", "c</w>", 2L)))
  }

  test("encode applies merges by rank and round-trips exactly") {
    val corpus = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox was quick",
      "pack my box with five dozen liquor jugs",
      "the dog was not amused").toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 40, minPairCount = 2)
    val enc = Bpe.encode(corpus.withColumn("id", monotonically_increasing_id()),
      "text", merges)
    val audit = Bpe.encodeAudit(enc, "id", "text").collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Boolean]("roundtrip_ok"), s"lossy encoding: $r")
      assert(r.getAs[Boolean]("count_sane"), s"token count out of bounds: $r")
    }
    // "the" appears 4 times with 40 merges available — it must have fused
    // into a single token
    val toks = enc.filter(col("text").startsWith("the quick brown fox jumps"))
      .select(col("tokens")).head().getSeq[String](0)
    assert(toks.contains("the</w>"), s"frequent word not fused: $toks")
  }

  test("zero learned merges yields per-character tokens") {
    val one = Seq("xyz qr").toDF("text")
    // corpus where no pair repeats enough: minPairCount impossible
    val merges = Bpe.train(one, "text", numMerges = 5, minPairCount = 99)
    assert(merges.count() === 0)
    val enc = Bpe.encode(one, "text", merges).head()
    assert(enc.getSeq[String](enc.fieldIndex("tokens")) ===
      Seq("x", "y", "z</w>", "q", "r</w>"))
  }

  test("training is deterministic and unaffected by partitioning") {
    val corpus = (1 to 200).map(i => s"alpha beta gamma w$i alpha beta").toDF("text")
    val m1 = Bpe.train(corpus.repartition(13), "text", numMerges = 20).collect()
    val m2 = Bpe.train(corpus.repartition(1), "text", numMerges = 20).collect()
    assert(m1.toSeq === m2.toSeq)
  }

  test("maxWords cap keeps the most frequent words") {
    // rare words beyond the cap must not contribute pairs
    val corpus = (Seq.fill(50)("zz zz") ++ Seq("rareword")).toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 3, maxWords = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.toSeq === Seq(("z", "z</w>")))
  }

  test("words unseen in training encode with whatever merges apply") {
    val corpus = Seq.fill(5)("banana").toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 10)
    val enc = Bpe.encode(Seq("bandana").toDF("text"), "text", merges).head()
    val toks = enc.getSeq[String](enc.fieldIndex("tokens"))
    assert(toks.mkString("") === "bandana</w>") // still lossless
  }

  test("token ids: deterministic, invertible in-vocab, OOV byte-falls-back") {
    val corpus = (Seq.fill(5)("ab ab ba") ++ Seq.fill(3)("abc")).toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 20)
    val v1 = Bpe.vocabWithIds(corpus, "text", merges)
    val v2 = Bpe.vocabWithIds(corpus.repartition(5), "text", merges)
    assert(v1.collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2).toSeq ===
      v2.collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2).toSeq)
    assert(v1.filter(col("token") === "<unk>").head().getInt(1) === 0)
    // every id unique, every token of an in-vocab encode round-trips
    val ids = v1.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(ids.values.toSeq.distinct.size === ids.size)
    val inv = ids.map(_.swap)
    val enc = Bpe.encodeIds(Seq("ab ba abc").toDF("text"), "text", merges, v1).head()
    val tokIds = enc.getSeq[Int](enc.fieldIndex("token_ids"))
    assert(tokIds.nonEmpty && !tokIds.contains(Bpe.UnkId))
    assert(tokIds.map(inv).mkString("") === "ab</w>ba</w>abc</w>")
    // characters never seen in training byte-fall-back: one byte token
    // per ASCII char, last one sentinel-fused, zero unk
    val oov = Bpe.encodeIds(Seq("xyz").toDF("text"), "text", merges, v1).head()
    val oovIds = oov.getSeq[Int](oov.fieldIndex("token_ids"))
    assert(oovIds.forall(_ != Bpe.UnkId) && oovIds.size === 3)
    assert(oovIds.map(inv) === Seq("<0x78>", "<0x79>", "<0x7A></w>"))
  }

  test("trainArtifacts: merges + vocab from provably ONE corpus scan") {
    val sc = spark.sparkContext
    val scans = sc.longAccumulator("corpus-row-reads")
    val raw = (Seq.fill(5)("ab ab ba") ++ Seq.fill(3)("abc") ++ Seq("qq zz")).toSeq
    // every pass over the corpus increments the accumulator once per row —
    // a second scan would read 2x the row count
    val corpus = spark.createDataset(sc.parallelize(raw, 3).map { s => scans.add(1); s }).toDF("text")
    val (merges, vocabIds) = Bpe.trainArtifacts(corpus, "text", numMerges = 20)
    assert(scans.value === raw.size.toLong,
      s"expected exactly ${raw.size} row reads (one corpus pass), got ${scans.value}")
    // identical artifacts to the two-call path
    val m2 = Bpe.train(corpus, "text", numMerges = 20)
    val v2 = Bpe.vocabWithIds(corpus, "text", m2)
    assert(merges.collect().toSeq === m2.collect().toSeq)
    assert(vocabIds.collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2).toSeq ===
      v2.collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._2).toSeq)
    // charset of the capped words covers the whole tiny corpus
    val toks = vocabIds.select("token").as[String].collect().toSet
    assert(Seq("a", "b", "q", "z", "b</w>", "c</w>").forall(toks.contains), s"missing base chars in $toks")
  }

  test("vocab contains every merged symbol") {
    val corpus = Seq.fill(4)("ab ab").toDF("text")
    val merges = Bpe.train(corpus, "text", numMerges = 5)
    val v = Bpe.vocab(merges).as[String].collect().toSet
    assert(v.contains("ab</w>"))
  }

  test("byte fallback: arbitrary unicode round-trips through ids with zero unk") {
    val train = Seq.fill(10)("the quick brown fox jumps").toDF("text")
    val (merges, vocabIds) = Bpe.trainArtifacts(train, "text", numMerges = 20)
    // the 512 byte tokens are in the vocabulary
    val toks = vocabIds.select("token").as[String].collect().toSet
    assert(toks.contains("<0x00>") && toks.contains("<0xFF></w>"))
    // CJK, emoji (surrogate pair), accents, cyrillic — none in training
    val wild = Seq("日本語テキスト", "café 😀 ok", "привет the quick",
      "mixed日本and🍕slices").toDF("text")
    val enc = Bpe.encodeIds(wild, "text", merges, vocabIds)
    val idsOut = enc.select("token_ids").as[Seq[Int]].collect()
    assert(idsOut.forall(ids => ids.nonEmpty && ids.forall(_ != Bpe.UnkId)),
      "byte fallback must leave zero unk ids")
    // exact round-trip: decode reproduces the whitespace-joined words
    val rt = Bpe.decodeIds(enc, "token_ids", vocabIds)
      .select(col("decoded_text"),
        concat_ws(" ", filter(split(col("text"), "\\s+"), w => length(w) > 0)).as("want"))
      .as[(String, String)].collect()
    rt.foreach { case (got, want) => assert(got === want) }
    // in-charset text still round-trips (fallback changed nothing there)
    val tame = Bpe.decodeIds(
        Bpe.encodeIds(train.limit(1), "text", merges, vocabIds),
        "token_ids", vocabIds)
      .select("decoded_text").as[String].head
    assert(tame === "the quick brown fox jumps")
  }

  /** Pre-tokens of one string under gpt2 mode, via the same Spark
    * expression the library uses. */
  private def gpt2Pre(s: String): Seq[String] =
    Seq(s).toDF("text")
      .select(regexp_extract_all(col("text"), lit(Bpe.Gpt2Pattern), lit(0)))
      .as[Seq[String]].head

  test("gpt2 pre-tokenization: hand-computed segmentation") {
    // punctuation separates from words; the leading space rides the token
    assert(gpt2Pre("Hello, world!") === Seq("Hello", ",", " world", "!"))
    // contractions split; digits split from letters
    assert(gpt2Pre("it's 42abc") === Seq("it", "'s", " 42", "abc"))
    // punctuation runs group; space-prefixed punctuation keeps its space
    assert(gpt2Pre("wait... what?!") === Seq("wait", "...", " what", "?!"))
    // a 2+ whitespace run is its own token (the disclosed lookahead-free
    // divergence: the next token then has NO space prefix)
    assert(gpt2Pre("a  b") === Seq("a", "  ", "b"))
    // concatenation reproduces the input byte-for-byte — the exactness
    // guarantee gpt2-mode decode relies on
    for (s <- Seq("Hello, world!", "it's 42abc", "a  b\tc\nd", " leading", "trailing  "))
      assert(gpt2Pre(s).mkString === s)
    // unicode letters are letters (\p{L}), not punctuation
    assert(gpt2Pre("café 日本語!") === Seq("café", " 日本語", "!"))
  }

  test("gpt2 mode: punctuation never merges into words; decode is byte-exact") {
    val corpus = Seq.fill(12)("the end. the end. it's fine!").toDF("text")
    val (merges, vocabIds) =
      Bpe.trainArtifacts(corpus, "text", numMerges = 40, preTokenize = Bpe.Gpt2)
    // under whitespace mode "end." would be one trainable unit; under
    // gpt2 the '.' is its own pre-token, so no merge output contains a
    // letter glued to the period
    val mergedTokens = Bpe.vocab(merges).as[String].collect()
    assert(!mergedTokens.exists(t => t.replace(Bpe.EndOfWord, "").matches(".*[a-z]\\..*")),
      s"punctuation leaked into a merge: ${mergedTokens.mkString(",")}")
    // space-prefixed tokens exist (every non-initial word carries one)
    assert(mergedTokens.exists(_.startsWith(" ")),
      s"no space-prefixed merge in ${mergedTokens.mkString(",")}")
    val wild = Seq("the end... it's reálly 😀 fine!?  ok").toDF("text")
    val enc = Bpe.encodeIds(wild, "text", merges, vocabIds, preTokenize = Bpe.Gpt2)
    assert(enc.select("token_ids").as[Seq[Int]].head.forall(_ != Bpe.UnkId),
      "byte fallback must keep gpt2 mode zero-unk")
    val rt = Bpe.decodeIds(enc, "token_ids", vocabIds, preTokenize = Bpe.Gpt2)
      .select("decoded_text").as[String].head
    assert(rt === "the end... it's reálly 😀 fine!?  ok",
      s"gpt2 decode must be byte-exact, got [$rt]")
  }

  test("gpt2 mode: encodeAudit flags hold on punctuation-heavy text") {
    val docs = Seq(
      (1L, "Hello, world! it's 42."),
      (2L, "no-punct plain words"),
      (3L, "")).toDF("doc_id", "text")
    val (merges, vocabIds) =
      Bpe.trainArtifacts(docs, "text", numMerges = 10, preTokenize = Bpe.Gpt2)
    val enc = Bpe.encodeIds(
      Bpe.encode(docs, "text", merges, preTokenize = Bpe.Gpt2),
      "text", merges, vocabIds, preTokenize = Bpe.Gpt2)
    val audit = Bpe.encodeAudit(enc, "doc_id", "text", preTokenize = Bpe.Gpt2)
      .collect().map(r => r.getAs[Long]("n_words") ->
        (r.getAs[Boolean]("roundtrip_ok"), r.getAs[Boolean]("count_sane")))
    assert(audit.forall { case (_, (rt, cs)) => rt && cs }, audit.mkString(","))
    // doc 1 hand count: [Hello][,][ world][!][ it]['s][ 42][.]
    assert(audit.map(_._1).toSeq.contains(8L))
  }

  test("byte-token count pattern covers BOTH vocab surfaces (r16 advice)") {
    val re = Bpe.ByteTokenCountPat.r
    (0 until 256).foreach { b =>
      // the two surfaces vocabWithIds ships per byte value — a bare-only
      // pattern undercounts byte_fallback_tokens exactly 2x
      assert(re.findFirstIn(Bpe.byteToken(b)).isDefined, Bpe.byteToken(b))
      assert(re.findFirstIn(Bpe.byteToken(b) + Bpe.EndOfWord).isDefined)
    }
    // lookalikes a corpus could plant must NOT count
    for (t <- Seq("<0x2G>", "<0x2a>", "x<0x2A>", "<0x2A>x", "<0x2A></w>x",
        "<0x2A2>", "</w>", "<0x2A></w></w>"))
      assert(re.findFirstIn(t).isEmpty, t)
    // vocabWithIds really does ship exactly 512 byte entries, all matched
    val docs = Seq((1L, "aa ab")).toDF("doc_id", "text")
    val (merges, vocabIds) = Bpe.trainArtifacts(docs, "text", numMerges = 2)
    val byteEntries = vocabIds.filter(col("token").rlike(Bpe.ByteTokenCountPat)).count()
    assert(byteEntries === 512L)
    assert(merges.count() >= 0L) // merges unused beyond artifact shape
  }
}
