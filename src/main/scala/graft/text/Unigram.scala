package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer — the SentencePiece training shape
  * (Kudo 2018, arXiv:1804.10959): a vocabulary of subword PIECES with
  * unigram log-probabilities, trained by EM over the segmentation
  * lattice and pruned to a target size; encoding is per-word Viterbi
  * (the single best segmentation under the piece probabilities).
  *
  * Where BPE builds its vocabulary bottom-up by merging, the unigram LM
  * starts from a large seed of candidate substrings and SHRINKS — each
  * round re-estimates piece probabilities with forward-backward EM
  * (soft counts over every segmentation, not just the best one) and
  * drops the pieces contributing least expected mass, keeping all
  * single characters so every word stays segmentable.
  *
  * Scale shape is identical to [[Bpe]] and for the same published
  * reason: the ONLY corpus-sized work is the frequency-capped word
  * count ([[Bpe.cappedWordCounts]] — one map-side-combinable groupBy),
  * and the EM/prune loop runs on the driver over that bounded table.
  * The trained artifact is a tiny (piece, log_prob, piece_id) frame;
  * encoding broadcasts it in a UDF closure and is a pure scan with a
  * per-task memo — no join, no shuffle.
  *
  * Divergence from SentencePiece proper, by design: pruning ranks
  * pieces by expected count rather than the exact likelihood-loss of
  * removal (the common simplification; loss ranking and count ranking
  * agree except near ties). Byte fallback IS implemented, in
  * SentencePiece's own shape: the vocabulary carries the 256 `<0xNN>`
  * byte pieces (probability-less markers — Viterbi never chooses them
  * over a real piece), and [[encodeIds]] expands any un-id'd fallback
  * character into its UTF-8 byte pieces, so arbitrary text encodes with
  * zero `<unk>` and [[decodeIds]] round-trips exactly.
  */
object Unigram {

  /** Max candidate piece length in the seed vocabulary. */
  val MaxPieceLen = 8

  /** Train a unigram-LM piece vocabulary. Returns
    * `(piece STRING, log_prob DOUBLE, piece_id INT)` with id 0 reserved
    * for `<unk>` (log_prob null there), other ids assigned by piece sort
    * order — deterministic on any cluster layout, because everything
    * derives from the deterministic capped word counts.
    *
    * `vocabSize` counts real pieces (excluding `<unk>`); single
    * characters are always retained even if that overflows a too-small
    * `vocabSize`. `emIters` EM rounds run between prune steps;
    * `shrinkFactor` keeps that fraction of prunable pieces per round. */
  def train(
      df: DataFrame,
      textCol: String,
      vocabSize: Int,
      maxWords: Int = 50000,
      seedMultiplier: Int = 4,
      emIters: Int = 2,
      shrinkFactor: Double = 0.75,
      preTokenize: String = Bpe.Whitespace): DataFrame =
    trainFromCounts(df.sparkSession,
      Bpe.cappedWordCounts(df, textCol, maxWords, preTokenize),
      vocabSize, seedMultiplier, emIters, shrinkFactor)

  /** Driver-side EM + prune loop over a bounded (word, count) table. */
  def trainFromCounts(
      spark: SparkSession,
      wordCounts: Seq[(String, Long)],
      vocabSize: Int,
      seedMultiplier: Int = 4,
      emIters: Int = 2,
      shrinkFactor: Double = 0.75): DataFrame = {
    import spark.implicits._
    require(vocabSize > 0, s"need vocabSize > 0, got $vocabSize")
    require(seedMultiplier >= 1, s"need seedMultiplier >= 1, got $seedMultiplier")
    require(shrinkFactor > 0 && shrinkFactor < 1,
      s"need 0 < shrinkFactor < 1, got $shrinkFactor")
    val words = wordCounts.filter(_._1.nonEmpty).toVector
    require(words.nonEmpty, "unigram training needs a non-empty word table")

    // ---- seed: all substrings up to MaxPieceLen, scored count*len; keep
    // the top seedMultiplier*vocabSize plus every single character
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + MaxPieceLen)) {
          val s = w.substring(i, j)
          subCounts.update(s, subCounts.getOrElse(s, 0L) + c)
          j += 1
        }
        i += 1
      }
    }
    val chars = subCounts.keysIterator.filter(_.length == 1).toVector
    val multi = subCounts.iterator.filter(_._1.length > 1).toVector
      .sortBy { case (s, c) => (-c * s.length, s) }
      .take(math.max(0, seedMultiplier * vocabSize - chars.length))
      .map(_._1)
    var vocab: Set[String] = chars.toSet ++ multi

    // ---- EM + prune until the vocabulary reaches vocabSize
    var probs: Map[String, Double] = {
      val tot = vocab.iterator.map(subCounts(_).toDouble).sum
      vocab.iterator.map(p => p -> subCounts(p) / tot).toMap
    }
    var rounds = 0
    val maxRounds = 100 // derived bound: shrinkFactor^100 kills any seed
    while (rounds < maxRounds &&
      (vocab.count(_.length > 1) + chars.length > vocabSize || rounds == 0)) {
      var it = 0
      var expected: Map[String, Double] = probs
      while (it < emIters) {
        expected = eStep(words, vocab, probs)
        val tot = expected.valuesIterator.sum
        probs = expected.map { case (p, e) => p -> math.max(e / tot, 1e-12) }
        it += 1
      }
      val prunableTarget = math.max(0, vocabSize - chars.length)
      val keepMulti = vocab.iterator.filter(_.length > 1).toVector
        .sortBy(p => (-expected.getOrElse(p, 0.0), p))
        .take(math.max(prunableTarget,
          (vocab.count(_.length > 1) * shrinkFactor).toInt))
      val next = chars.toSet ++ keepMulti
      if (next == vocab && vocab.count(_.length > 1) <= prunableTarget) rounds = maxRounds
      else vocab = next
      rounds += 1
    }
    // final shrink to exactly the target (expected-count order), then one
    // last M step so the persisted log-probs reflect the final vocabulary
    val finalExpected = eStep(words, vocab, probs)
    val keep = chars.toSet ++ vocab.iterator.filter(_.length > 1).toVector
      .sortBy(p => (-finalExpected.getOrElse(p, 0.0), p))
      .take(math.max(0, vocabSize - chars.length))
    val fe = eStep(words, keep, probs.filter(kv => keep(kv._1)))
    val tot = math.max(fe.valuesIterator.sum, 1e-12)
    val rows = keep.toVector.sorted.zipWithIndex.map { case (p, i) =>
      (p, math.log(math.max(fe.getOrElse(p, 0.0), 1e-12) / tot), i + 1)
    }
    // byte-fallback pieces: probability-less id markers after the real
    // pieces (null log_prob keeps them out of the Viterbi tables, so a
    // real piece always wins); a corpus piece that literally spells
    // <0xNN> keeps its trained row and the marker is skipped
    val taken = keep ++ Set(Bpe.UnkToken)
    val bytePieces = (0 until 256).map(Bpe.byteToken).filterNot(taken)
      .zipWithIndex.map { case (p, i) => (p, Double.NaN, rows.length + 1 + i) }
    ((Bpe.UnkToken, Double.NaN, Bpe.UnkId) +: (rows ++ bytePieces))
      .toDF("piece", "log_prob", "piece_id")
      .withColumn("log_prob",
        when(isnan(col("log_prob")), lit(null).cast("double"))
          .otherwise(col("log_prob")))
  }

  /** Forward-backward expected piece counts over every word's
    * segmentation lattice (soft EM). Lattice nodes are character
    * positions; an edge (j, i) exists when w[j..i) is in the vocabulary.
    * Expected count of that edge = alpha(j) * p * beta(i) / Z. Words with
    * no full segmentation (impossible while single chars stay in vocab)
    * contribute nothing. */
  private def eStep(
      words: Vector[(String, Long)],
      vocab: Set[String],
      probs: Map[String, Double]): Map[String, Double] = {
    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    def p(s: String): Double = math.max(probs.getOrElse(s, 1e-12), 1e-12)
    words.foreach { case (w, c) =>
      val n = w.length
      val alpha = Array.fill(n + 1)(0.0); alpha(0) = 1.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - MaxPieceLen)
        while (j < i) {
          val s = w.substring(j, i)
          if (alpha(j) > 0 && vocab(s)) alpha(i) += alpha(j) * p(s)
          j += 1
        }
        i += 1
      }
      val z = alpha(n)
      if (z > 0) {
        val beta = Array.fill(n + 1)(0.0); beta(n) = 1.0
        i = n - 1
        while (i >= 0) {
          var k = i + 1
          while (k <= math.min(n, i + MaxPieceLen)) {
            val s = w.substring(i, k)
            if (beta(k) > 0 && vocab(s)) beta(i) += p(s) * beta(k)
            k += 1
          }
          i -= 1
        }
        var j = 0
        while (j < n) {
          var k = j + 1
          while (k <= math.min(n, j + MaxPieceLen)) {
            val s = w.substring(j, k)
            if (vocab(s) && alpha(j) > 0 && beta(k) > 0) {
              val e = alpha(j) * p(s) * beta(k) / z * c
              if (e > 0) acc.update(s, acc.getOrElse(s, 0.0) + e)
            }
            k += 1
          }
          j += 1
        }
      }
    }
    acc.toMap
  }

  /** Viterbi-best segmentation of one word under piece log-probs:
    * maximize the sum of piece log-probabilities. Characters with no
    * piece at all break the word into an `<unk>` marker at that
    * position (the encode UDF maps it to [[Bpe.UnkId]]). */
  private[text] def segmentWord(
      word: String, logp: Map[String, Double]): Vector[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity); best(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        val s = word.substring(j, i)
        val lp = logp.get(s)
        if (lp.isDefined && best(j) + lp.get > best(i)) {
          best(i) = best(j) + lp.get
          back(i) = j
        }
        j += 1
      }
      // no piece reaches i: consume one CODE POINT (not one char — a
      // split surrogate pair would be unencodable as UTF-8) as a
      // fallback piece so the segmentation always completes; encodeIds
      // expands such pieces into byte-piece ids
      if (back(i) < 0) {
        val start =
          if (i >= 2 && Character.isSurrogatePair(word.charAt(i - 2), word.charAt(i - 1)))
            i - 2
          else i - 1
        best(i) = best(start); back(i) = start
      }
      i += 1
    }
    val out = List.newBuilder[String]
    var k = n
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (k > 0) { cuts += k; k = back(k) }
    var start = 0
    cuts.reverseIterator.foreach { end =>
      out += word.substring(start, end); start = end
    }
    out.result().toVector
  }

  /** Tokenize `textCol` with a trained piece table: adds
    * `pieces ARRAY<STRING>` and `n_pieces`. Same pure-scan shape as
    * [[Bpe.encode]] — the piece table rides the closure, a per-task
    * memo exploits the Zipf distribution of words. */
  def encode(
      df: DataFrame,
      textCol: String,
      pieces: DataFrame,
      preTokenize: String = Bpe.Whitespace): DataFrame = {
    val logp: Map[String, Double] = pieces
      .filter(col("log_prob").isNotNull)
      .select(col("piece"), col("log_prob"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val words = Bpe.wordsOf(textCol, preTokenize)
    val enc = udf(new (Seq[String] => Seq[String]) with Serializable {
      @transient private lazy val memo =
        scala.collection.mutable.HashMap.empty[String, Vector[String]]
      override def apply(ws: Seq[String]): Seq[String] =
        ws.flatMap(w => memo.getOrElseUpdate(w, segmentWord(w, logp)))
    })
    df.withColumn("pieces", enc(words))
      .withColumn("n_pieces", size(col("pieces")))
  }

  /** [[encode]] to numeric ids: `piece_ids ARRAY<INT>`. Pieces outside
    * the id table (single-char fallbacks from [[segmentWord]] for
    * characters the training corpus never saw) expand to their UTF-8
    * `<0xNN>` byte-piece ids — zero `<unk>` for arbitrary text, exact
    * [[decodeIds]] round-trip. */
  def encodeIds(
      df: DataFrame,
      textCol: String,
      pieces: DataFrame,
      preTokenize: String = Bpe.Whitespace): DataFrame = {
    val logp: Map[String, Double] = pieces
      .filter(col("log_prob").isNotNull)
      .select(col("piece"), col("log_prob"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ids: Map[String, Int] = pieces
      .select(col("piece"), col("piece_id").cast("int"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val words = Bpe.wordsOf(textCol, preTokenize)
    val enc = udf(new (Seq[String] => Seq[Int]) with Serializable {
      @transient private lazy val memo =
        scala.collection.mutable.HashMap.empty[String, Vector[Int]]
      override def apply(ws: Seq[String]): Seq[Int] =
        ws.flatMap(w => memo.getOrElseUpdate(w,
          segmentWord(w, logp).flatMap { s =>
            ids.get(s) match {
              case Some(i) => Vector(i)
              case None => s.getBytes("UTF-8").toVector
                .map(b => ids.getOrElse(Bpe.byteToken(b & 0xff), Bpe.UnkId))
            }
          }))
    })
    df.withColumn("piece_ids", enc(words))
      .withColumn("n_pieces", size(col("piece_ids")))
  }

  /** Invert [[encodeIds]]: every piece contributes its UTF-8 bytes
    * (`<0xNN>` pieces their single byte), the concatenation decodes as
    * UTF-8. Unigram pieces carry no word sentinel, so the result is the
    * WORD CONCATENATION (whitespace is not recoverable — the documented
    * contract [[encodeAudit]]'s roundtrip flag also checks against).
    * Under `preTokenize = Bpe.Gpt2` encoding, pre-tokens CARRY their
    * whitespace, so this same concatenation reproduces the input
    * byte-for-byte — gpt2 mode upgrades unigram decode to exact. */
  def decodeIds(
      df: DataFrame,
      idsCol: String,
      pieces: DataFrame,
      outCol: String = "decoded_text"): DataFrame = {
    val byteRe = Bpe.ByteTokenRe // single owner of the byte-token contract
    val toks: Map[Int, String] = pieces
      .select(col("piece_id").cast("int"), col("piece"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val dec = udf { (pieceIds: Seq[Int]) =>
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      pieceIds.foreach { i =>
        toks.getOrElse(i, Bpe.UnkToken) match {
          case byteRe(hex) => bytes += Integer.parseInt(hex, 16).toByte
          case s           => bytes ++= s.getBytes("UTF-8")
        }
      }
      new String(bytes.toArray, "UTF-8")
    }
    df.withColumn(outCol, dec(col(idsCol)))
  }

  /** Oracle-checkable audit of an encoded frame — the unigram twin of
    * [[Bpe.encodeAudit]]: exact word count plus invariant flags that
    * must be uniformly TRUE (pieces concatenate back to the
    * whitespace-joined words — Viterbi segmentations are exact covers —
    * and the piece count is between one per word and one per UTF-8 BYTE,
    * the byte-fallback worst case). */
  def encodeAudit(
      encoded: DataFrame,
      idCol: String,
      textCol: String,
      preTokenize: String = Bpe.Whitespace): DataFrame = {
    val ws = Bpe.wordsOf(textCol, preTokenize)
    encoded.select(
      col(idCol),
      size(ws).cast("long").as("n_words"),
      (concat_ws("", col("pieces")) === concat_ws("", ws) || size(ws) === 0)
        .as("roundtrip_ok"),
      (col("n_pieces") >= size(ws) &&
        col("n_pieces") <= octet_length(concat_ws("", ws)) ||
        size(ws) === 0).as("count_sane"))
  }
}
