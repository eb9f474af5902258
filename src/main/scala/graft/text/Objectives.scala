package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Exprs

/** Training-objective data transforms: the document rewrites a trainer
  * applies between curation and packing.
  *
  * Three published objectives, all re-expressed as pure Spark
  * projections (no shuffle, no UDF, no driver state — every transform
  * is a per-row rewrite that scales as a map pass over the corpus):
  *
  *  - '''Fill-in-the-middle''' (Bavarian et al. 2022, "Efficient
  *    Training of Language Models to Fill in the Middle"): split a
  *    document at two random points and rearrange
  *    prefix/middle/suffix around sentinel markers, PSM or SPM mode.
  *  - '''Span corruption''' (Raffel et al. 2020, T5): mask random
  *    token spans with `<extra_id_k>` sentinels; the target replays
  *    the masked spans behind their sentinels.
  *  - '''Prefix-LM split''' (the S-denoiser of Tay et al. 2022, UL2):
  *    cut the document once; input = prefix, target = continuation.
  *
  * [[ul2Mix]] composes the three into UL2's mixture-of-denoisers with
  * per-document task tokens.
  *
  * Every random choice is a seeded md5 draw over (seed, doc id, role)
  * — the library's portable-draw idiom ([[graft.Exprs.md5Bits52]]) —
  * so the transforms are deterministic, reproducible across engines,
  * and auditable row by row (the DuckDB oracles replay the exact
  * strings). Offsets count CODE POINTS (what both engines' `length` /
  * `substring` index by), never UTF-16 units or bytes.
  */
object Objectives {

  private val Two52 = 4503599627370496.0 // 2^52, the md5Bits52 range

  /** (draw + 0.5) / 2^52 in (0,1) — the library's probability-draw shape. */
  private def unit(key: Column): Column =
    (Exprs.md5Bits52(key) + lit(0.5)) / lit(Two52)

  private def key(parts: Column*): Column = concat_ws(":", parts: _*)

  // ---------------------------------------------------------------- FIM

  /** Fill-in-the-middle transform (Bavarian et al. 2022). With
    * probability `rate` per document, draw two cut points uniformly
    * over [0, n] code points (`lo` ≤ `hi`), split the text into
    * prefix `[0,lo)` / middle `[lo,hi)` / suffix `[hi,n)`, and emit
    * the rearranged training text; otherwise pass the text through.
    * Mode per transformed document: with probability `spmRate` the
    * SPM layout, else PSM — both in the sentinel-token wire format of
    * the public Megatron-LM implementation (also the paper's
    * appendix-D joined SPM, where the prefix stays adjacent to the
    * middle so its KV cache is reusable):
    *
    *  - PSM: `P ++ prefix ++ S ++ suffix ++ M ++ middle`
    *  - SPM: `P ++ S ++ suffix ++ M ++ prefix ++ middle`
    *
    * where P/S/M are `prefixTok`/`suffixTok`/`middleTok`. Character-
    * level FIM (the paper's §3 default is to split on characters, not
    * tokens, so middles can start mid-word — they found this HELPS);
    * run before tokenization so the sentinels become single special
    * tokens downstream.
    *
    * Adds `fim_applied`, `fim_mode` (`psm`/`spm`/`none`), `cut_lo`,
    * `cut_hi` (null when not applied) and `fim_text`. Pure
    * projection: seeded md5 draws keyed on
    * `fim:<seed>:<id>:<role>`, no shuffle. Invariant:
    * `prefix ++ middle ++ suffix == text` whenever applied. */
  def fimTransform(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rate: Double = 0.9,
      spmRate: Double = 0.5,
      seed: Long = 0L,
      prefixTok: String = "<|fim_prefix|>",
      suffixTok: String = "<|fim_suffix|>",
      middleTok: String = "<|fim_middle|>"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    require(spmRate >= 0 && spmRate <= 1,
      s"spmRate must be in [0,1], got $spmRate")
    val id = col(idCol).cast("string")
    val text = col(textCol)
    val n = length(text).cast("long")
    def draw(role: String): Column =
      key(lit("fim"), lit(seed.toString), id, lit(role))
    val applied = unit(draw("apply")) < lit(rate)
    val spm = unit(draw("mode")) < lit(spmRate)
    // modulo over the 52-bit draw: exactly replayable, bias ~ n / 2^52
    val a = Exprs.md5Bits52(draw("cut1")) % (n + 1)
    val b = Exprs.md5Bits52(draw("cut2")) % (n + 1)
    val lo = least(a, b)
    val hi = greatest(a, b)
    val prefix = text.substr(lit(1), lo)
    val middle = text.substr(lo + 1, hi - lo)
    val suffix = text.substr(hi + 1, n - hi)
    df.withColumn("fim_applied", applied)
      .withColumn("fim_mode",
        when(!applied, "none").when(spm, "spm").otherwise("psm"))
      .withColumn("cut_lo", when(applied, lo))
      .withColumn("cut_hi", when(applied, hi))
      .withColumn("fim_text",
        when(!applied, text)
          .when(spm, concat(lit(prefixTok), lit(suffixTok), suffix,
            lit(middleTok), prefix, middle))
          .otherwise(concat(lit(prefixTok), prefix, lit(suffixTok), suffix,
            lit(middleTok), middle)))
  }

  // ---------------------------------------------- T5 span corruption

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4), in the
    * block-deterministic form that keeps the draws portable: the
    * document's whitespace tokens are cut into fixed blocks of
    * `B = round(meanSpan / noiseDensity)` tokens; every FULL block
    * masks exactly one span whose length is uniform on
    * `[1, 2·meanSpan−1]` (mean `meanSpan`) and whose offset is
    * uniform over the block's legal starts — so the corruption rate
    * converges to `noiseDensity` and spans can never touch, while
    * every choice is a seeded md5 draw keyed on
    * `sc:<seed>:<id>:<block>:<role>` that an external engine can
    * replay exactly (T5's sequential random walk cannot be). The
    * trailing partial block stays clean.
    *
    * Block `k`'s span is replaced by `<extra_id_k>` in the input; the
    * target is each sentinel followed by its masked tokens, closed by
    * the final sentinel `<extra_id_nSpans>` (the T5 wire format).
    * Interleaving the target's spans back into the input reconstructs
    * the token stream exactly.
    *
    * Adds `n_spans`, `n_masked_tokens`, `span_input`, `span_target`.
    * Pure projection: the per-token work is an O(1) lookup into a
    * per-document block table (`element_at`), never a scan of all
    * spans, so cost is linear in corpus tokens. */
  def spanCorrupt(
      df: DataFrame,
      idCol: String,
      textCol: String,
      meanSpan: Int = 3,
      noiseDensity: Double = 0.15,
      seed: Long = 0L): DataFrame = {
    require(meanSpan >= 1, s"meanSpan must be >= 1, got $meanSpan")
    require(noiseDensity > 0 && noiseDensity < 1,
      s"noiseDensity must be in (0,1), got $noiseDensity")
    val blockSize = math.max(1, math.round(meanSpan / noiseDensity).toInt)
    val maxLen = 2 * meanSpan - 1
    require(maxLen <= blockSize,
      s"noiseDensity $noiseDensity too high for meanSpan $meanSpan: " +
        s"max span $maxLen exceeds block size $blockSize")
    val id = Exprs.bt(idCol)
    val B = blockSize
    // conv-chain md5 draw inside HOF lambdas (md5Bits52 is a Column
    // wrapper; inside expr() SQL the equivalent idiom is the conv form
    // — numerically identical, see expressions/Md5Bits52.scala)
    def sqlDraw(role: String): String =
      s"cast(conv(substring(md5(concat_ws(':', 'sc', '$seed', " +
        s"cast($id as string), cast(b as string), '$role')), 1, 13), " +
        "16, 10) as bigint)"
    val withToks = df
      .withColumn("__toks",
        filter(split(col(textCol), "\\s+"), t => length(t) > 0))
      .withColumn("__nb", (size(col("__toks")) / B).cast("int"))
      // sequence(0, -1) steps DOWNWARD instead of being empty — guard
      .withColumn("__blocks", expr(
        s"""IF(__nb > 0,
           |  transform(sequence(0, __nb - 1), b -> named_struct(
           |    'len', int(1 + ${sqlDraw("len")} % $maxLen),
           |    'off', int(${sqlDraw("off")} %
           |      ($B - int(1 + ${sqlDraw("len")} % $maxLen) + 1)))),
           |  array())""".stripMargin))
    withToks
      .withColumn("n_spans", col("__nb").cast("long"))
      .withColumn("n_masked_tokens", expr(
        "aggregate(__blocks, 0L, (a, s) -> a + s.len)"))
      .withColumn("span_input", expr(
        s"""IF(size(__toks) = 0, '', concat_ws(' ', filter(
           |  transform(sequence(0, size(__toks) - 1), i ->
           |    CASE
           |      WHEN int(i div $B) < __nb
           |           AND i % $B = element_at(__blocks, int(i div $B) + 1).off
           |        THEN concat('<extra_id_', int(i div $B), '>')
           |      WHEN int(i div $B) < __nb
           |           AND i % $B >= element_at(__blocks, int(i div $B) + 1).off
           |           AND i % $B <  element_at(__blocks, int(i div $B) + 1).off
           |                        + element_at(__blocks, int(i div $B) + 1).len
           |        THEN CAST(NULL AS STRING)
           |      ELSE element_at(__toks, int(i) + 1)
           |    END),
           |  x -> x IS NOT NULL)))""".stripMargin))
      .withColumn("span_target", expr(
        s"""concat_ws(' ', flatten(concat(
           |  transform(__blocks, (s, b) -> concat(
           |    array(concat('<extra_id_', b, '>')),
           |    slice(__toks, b * $B + s.off + 1, s.len))),
           |  array(array(concat('<extra_id_', __nb, '>'))))))""".stripMargin))
      .drop("__toks", "__blocks", "__nb")
  }

  // ------------------------------------------------- prefix-LM split

  /** Prefix-LM split — UL2's S-denoiser (Tay et al. 2022 §3.1): one
    * seeded uniform cut over [0, n] code points; `prefix_input` is
    * the text before the cut, `prefix_target` the continuation after
    * it. Adds `cut`, `prefix_input`, `prefix_target`. Pure
    * projection, draw keyed on `plm:<seed>:<id>:cut`. */
  def prefixLmSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seed: Long = 0L): DataFrame = {
    val text = col(textCol)
    val n = length(text).cast("long")
    val cut = Exprs.md5Bits52(key(
      lit("plm"), lit(seed.toString), col(idCol).cast("string"),
      lit("cut"))) % (n + 1)
    df.withColumn("cut", cut)
      .withColumn("prefix_input", text.substr(lit(1), cut))
      .withColumn("prefix_target", text.substr(cut + 1, n - cut))
  }

  // ------------------------------------------- UL2 mixture of denoisers

  /** UL2 mixture-of-denoisers (Tay et al. 2022): every document is
    * assigned ONE denoiser by a seeded draw keyed
    * `ul2:<seed>:<id>:task` — R (regular span corruption, mean 3 /
    * density 0.15), S (prefix-LM split) or X (extreme corruption,
    * mean `xMeanSpan` / density `xDensity`) with shares
    * `rShare`/`sShare`/the remainder — then transformed by that
    * denoiser, with the paradigm token `[R]`/`[S]`/`[X]` prepended to
    * the input (the paper's mode-switching convention). Output:
    * original columns + `denoiser`, `input`, `target`.
    *
    * Plan shape: the corpus is filtered into three disjoint slices
    * (same scan, pushed predicate), each transformed by its pure
    * projection, then `unionByName`d — still no shuffle anywhere.
    * Sub-draws reuse the primitives' own key spaces, so an R-document
    * here corrupts identically to [[spanCorrupt]] called alone with
    * the same seed. */
  def ul2Mix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rShare: Double = 0.5,
      sShare: Double = 0.25,
      seed: Long = 0L,
      xMeanSpan: Int = 32,
      xDensity: Double = 0.5): DataFrame = {
    require(rShare >= 0 && sShare >= 0 && rShare + sShare <= 1,
      s"shares must be non-negative and sum <= 1, got $rShare/$sShare")
    val u = unit(key(
      lit("ul2"), lit(seed.toString), col(idCol).cast("string"),
      lit("task")))
    val tagged = df.withColumn("denoiser",
      when(u < rShare, "R")
        .when(u < rShare + sShare, "S")
        .otherwise("X"))
    val keep = df.columns.map(col) :+ col("denoiser")
    val r = spanCorrupt(
      tagged.filter(col("denoiser") === "R"), idCol, textCol,
      meanSpan = 3, noiseDensity = 0.15, seed = seed)
      .select(keep :+ concat(lit("[R] "), col("span_input")).as("input")
        :+ col("span_target").as("target"): _*)
    val s = prefixLmSplit(
      tagged.filter(col("denoiser") === "S"), idCol, textCol, seed = seed)
      .select(keep :+ concat(lit("[S] "), col("prefix_input")).as("input")
        :+ col("prefix_target").as("target"): _*)
    val x = spanCorrupt(
      tagged.filter(col("denoiser") === "X"), idCol, textCol,
      meanSpan = xMeanSpan, noiseDensity = xDensity, seed = seed)
      .select(keep :+ concat(lit("[X] "), col("span_input")).as("input")
        :+ col("span_target").as("target"): _*)
    r.unionByName(s).unionByName(x)
  }
}
