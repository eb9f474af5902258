package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality ratios, a stopword/char-class language-ID
  * heuristic, and document fingerprinting.
  *
  * Everything is a pure column expression (whole-stage codegen, no UDFs),
  * so a pass over 100 TB of documents is one projection fused into the
  * parquet scan. Designed against the `documents` testdata table; the
  * heuristics are standard public-corpus tricks (length/punctuation/
  * stopword-ratio quality filters, n-gram/stopword language scoring).
  */
object TextAnalysis {

  /** Whitespace token count (0 for empty/blank). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish token count: word pieces plus isolated punctuation. */
  def regexTokenCount(c: Column): Column =
    regexp_count(c, lit("\\w+|[^\\w\\s]"))

  /** Ratio of characters matching a regex character class. */
  def charClassRatio(c: Column, clazz: String): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(
        (length(c) - length(regexp_replace(c, clazz, ""))).cast("double") / length(c))

  def punctRatio(c: Column): Column = charClassRatio(c, "[^A-Za-z0-9\\s]")
  def digitRatio(c: Column): Column = charClassRatio(c, "[0-9]")
  def upperRatio(c: Column): Column = charClassRatio(c, "[A-Z]")

  /** Lowercased whitespace tokens of a text column — the shared
    * tokenization for all word-count operators.
    *
    * Known quirk, shared by every engine that splits on \s+: text
    * LEADING with a non-space whitespace char (tab, newline — trim
    * strips only spaces) yields a phantom empty first token, and a
    * whitespace-only string yields one empty token rather than zero.
    * DuckDB's trim + string_split_regex behaves identically, so the
    * oracle gate holds; counts are consistent engine-to-engine and
    * self-consistent across tokens()/tokenCount()/the native kernels —
    * which is the property the packing offsets and chunkers rely on. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Per-set token-hit counts in one pass (native kernel; element i counts
    * tokens belonging to sets(i)). */
  def tokenSetCounts(c: Column, sets: Seq[Seq[String]]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.TokenSetCounts(
        org.apache.spark.sql.graft.Bridge.expression(tokens(c)), sets))

  /** Count of tokens equal to a literal word. (An earlier revision counted
    * via space-padded regexp_replace — one full-text scan per word, and it
    * undercounted consecutive repeats, " a a " → 1; token equality is both
    * the honest count and a single pass.) */
  def wordOccurrences(c: Column, word: String): Column =
    element_at(tokenSetCounts(c, Seq(Seq(word))), 1)

  /** Stopword sets used for language scoring — small, distinctive. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "nicht", "ist"),
    "es" -> Seq("el", "que", "los", "una", "es"),
    "fr" -> Seq("le", "les", "des", "est", "une"))

  /** Han-character count (CJK detection). */
  def hanCount(c: Column): Column =
    length(c) - length(regexp_replace(c, "[一-鿿]", ""))

  /** Per-language stopword-hit scores + detected language (argmax, ties by
    * language code ascending; 'zh' wins when Han chars dominate).
    *
    * This is the deliberately cheap FAST PATH — 5 languages
    * (en/de/es/fr stopwords + Han detection), one token pass, no model
    * artifact, all-zero evidence → null. For a genuinely multilingual
    * corpus use [[LangClassifier]] (learned char-n-gram model, 26-language
    * seed set, arbitrary label sets) — everything keyed on a language
    * column downstream (UniMax budgets, perplexity strata, the data card)
    * silently mislabels when a corpus outside these 5 languages is pushed
    * through the fast path.
    *
    * One tokenize + one native counting pass for ALL languages (the
    * stopword counts land in a single intermediate `__sw` column, which
    * Catalyst keeps un-collapsed because a non-cheap alias referenced
    * multiple times blocks CollapseProject) — the previous formulation was
    * one regexp_replace full-text scan per stopword, ~20 scans of every
    * byte per row. */
  /** The script ranges [[scriptProfile]] counts — name → regex char
    * range (literal code points, so the same class text runs in Java
    * regex and RE2). Block-level approximations of the major writing
    * systems; Latin excludes the ×/÷ symbols embedded in Latin-1. */
  val scriptRanges: Seq[(String, String)] = Seq(
    "arabic" -> "؀-ۿ",
    "cyrillic" -> "Ѐ-ӿ",
    "devanagari" -> "ऀ-ॿ",
    "greek" -> "Ͱ-Ͽ",
    "han" -> "一-鿿",
    "hangul" -> "가-힣",
    "hebrew" -> "֐-׿",
    "kana" -> "぀-ヿ",
    "latin" -> "A-Za-zÀ-ÖØ-öø-ɏ")

  /** Unicode script profile — the crawl-quality signal that PRECEDES
    * language ID: per-script character counts over the major writing
    * systems, the dominant script, its share of all script characters,
    * and a mixed-script flag (script chars outside the dominant system
    * above 5% — the classic spam/encoding-mojibake tell, and the gate
    * deciding which language-ID path a document takes). Counts use the
    * library's subtraction idiom `length(x) − length(regexp_replace(x,
    * range, ''))` — one regex pass per script over a block-range class,
    * identical semantics in Java regex and RE2, so the oracle replays
    * every count. Dominant = field-lexicographic max of (count, name)
    * structs over the scripts with count > 0 (ties to the
    * lexicographically later name, deterministic); all-zero rows (no
    * script character at all) keep a null dominant. Pure projection —
    * no shuffle, scales as a map pass. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    def cnt(range: String): Column =
      (length(c) - length(regexp_replace(c, s"[$range]", ""))).cast("long")
    val counted = scriptRanges.foldLeft(df.select(col(idCol), c)) {
      case (d, (name, range)) => d.withColumn(s"n_$name", cnt(range))
    }
    val total = scriptRanges.map { case (n, _) => col(s"n_$n") }
      .reduce(_ + _)
    val dom = array_max(filter(
      array(scriptRanges.map { case (n, _) =>
        struct(col(s"n_$n").as("c"), lit(n).as("s"))
      }: _*),
      s => s.getField("c") > 0))
    counted
      .withColumn("n_script_chars", total)
      .withColumn("dominant_script", dom.getField("s"))
      .withColumn("dominant_frac",
        round(dom.getField("c") / col("n_script_chars"), 6))
      .withColumn("script_mixed",
        coalesce(
          (col("n_script_chars") - dom.getField("c")).cast("double")
            > lit(0.05) * col("n_script_chars"),
          lit(false)))
      .drop(textCol)
  }

  def languageScores(df: DataFrame, textCol: String, out: String = "lang_detected"): DataFrame = {
    val c = col(textCol)
    val sortedLangs = langStopwords.keys.toSeq.sorted
    val withCounts =
      df.withColumn("__sw", tokenSetCounts(c, sortedLangs.map(langStopwords)))
    val scored = sortedLangs.zipWithIndex.foldLeft(withCounts) { case (d, (lang, i)) =>
      d.withColumn(s"score_$lang", element_at(col("__sw"), i + 1))
    }
    val withHan = scored.withColumn("score_zh", hanCount(c).cast("long")).drop("__sw")
    val langs = (langStopwords.keys.toSeq :+ "zh").sorted
    // argmax via a when-chain: first language (asc) with the max score.
    // All-zero scores = NO evidence (no stopword hit, no Han char) —
    // that's null, not a confident pick of the alphabetically first
    // language
    val maxScore = langs.map(l => col(s"score_$l")).reduce((a, b) => greatest(a, b))
    val pick = langs.foldRight(lit(null).cast("string"): Column) { (l, acc) =>
      when(col(s"score_$l") === maxScore, lit(l)).otherwise(acc)
    }
    withHan.withColumn(out, when(maxScore > 0, pick))
  }

  /** Quality score in [0,1]: length in range, sane punctuation/digit load,
    * some stopword mass (standard pretraining-corpus filters).
    *
    * Language-aware: the punctuation check ignores Han characters (they are
    * not Latin alphanumerics, but they are content, not punctuation), and
    * the stopword gate passes on ANY supported language's stopwords or on
    * Han content — an English-only gate silently capped every zh document
    * at 0.5 and filtered entire languages out of the corpus pipeline. */
  def qualityScore(c: Column, minChars: Int = 100, maxChars: Int = 20000): Column = {
    val lenOk = when(length(c).between(minChars, maxChars), 1.0).otherwise(0.0)
    // Unicode letter/number classes, not [A-Za-z0-9]: with the ASCII
    // class every Cyrillic/Arabic/Greek/Devanagari char counted as
    // "punctuation" and whole scripts failed the gate — the bug class the
    // original Han special-case fixed for zh alone. \p{L} subsumes Han.
    val punctOk = when(charClassRatio(c, "[^\\p{L}\\p{N}\\s]") < 0.2, 1.0).otherwise(0.0)
    val digitOk = when(digitRatio(c) < 0.3, 1.0).otherwise(0.0)
    val allStopwords = langStopwords.values.flatten.toSeq.distinct.sorted
    val stopHits = element_at(tokenSetCounts(c, Seq(allStopwords)), 1)
    val stopOk = when(stopHits > 0 || hanCount(c) > 0, 1.0).otherwise(0.0)
    (lenOk + punctOk + digitOk + stopOk) / 4.0
  }

  /** The eight words whose presence Gopher's rule 7 requires (Rae et al.
    * 2021, appendix A1.1): a document with fewer than 2 of them is
    * unlikely to be running English prose. */
  val GopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The published Gopher/MassiveText document-quality rules (Rae et al.
    * 2021 A1.1, minus the duplicate-fraction rules [[repetitionStats]]
    * already covers) as one pure-projection pass — per document every
    * rule's measured value, each rule's verdict, and the conjunction:
    *
    *   1. word count in [minWords, maxWords]
    *   2. mean word length in [3, 10]
    *   3. symbol-to-word ratio ('#' or ellipsis) ≤ 0.1
    *   4. ≤ 90% of lines start with a bullet
    *   5. ≤ 30% of lines end with an ellipsis
    *   6. ≥ 80% of words contain at least one letter
    *   7. ≥ 2 of the eight [[GopherRequiredWords]] present
    *
    * All plain array/string expressions — codegen'd, no shuffle, and
    * every number is replayable in the DuckDB oracle (`gopher_rules`).
    * Ratios are rounded to 6 decimals for cross-engine hash stability. */
  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000): DataFrame = {
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val nWords = size(words)
    val nWordsD = nWords.cast("double")
    val meanLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWordsD
    val symbols = size(split(col(textCol), "#", -1)) - 1 +
      regexp_count(col(textCol), lit("\\.{3}")) +
      regexp_count(col(textCol), lit("…"))
    val lines = filter(split(col(textCol), "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines)
    val bulletLines = size(filter(lines,
      l => trim(l).substr(lit(1), lit(1)).isin("•", "-", "*")))
    val ellipsisLines = size(filter(lines,
      l => trim(l).endsWith("...") || trim(l).endsWith("…")))
    val alphaWords = size(filter(words, w => w.rlike("\\p{L}")))
    val reqStops = size(array_intersect(
      array_distinct(transform(words, w => lower(w))),
      lit(GopherRequiredWords.toArray)))
    val out = df.select(
      col(idCol),
      nWords.cast("long").as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbols / nWordsD, 6).as("symbol_ratio"),
      round(bulletLines / nLines.cast("double"), 6).as("bullet_frac"),
      round(ellipsisLines / nLines.cast("double"), 6).as("ellipsis_frac"),
      round(alphaWords / nWordsD, 6).as("alpha_word_frac"),
      reqStops.cast("long").as("req_stop_hits"))
    out.withColumn("gopher_pass",
      col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_frac") <= 0.9 &&
        col("ellipsis_frac") <= 0.3 &&
        col("alpha_word_frac") >= 0.8 &&
        col("req_stop_hits") >= 2)
  }

  /** The published Gopher REPETITION rules (Rae et al. 2021 appendix
    * A1.1, table A1) — the duplicate-content half that [[gopherRules]]
    * delegates. Per document, thirteen measured fractions with their
    * published ceilings, each verdict, and the conjunction
    * `gopher_rep_pass`:
    *
    *   - `dup_line_frac` ≤ 0.30 / `dup_para_frac` ≤ 0.30: occurrences
    *     beyond each distinct line/paragraph's first, over all
    *     lines/paragraphs (lines split on `\n`, paragraphs on blank
    *     lines `\n{2,}`, both trimmed, empties dropped)
    *   - `dup_line_char_frac` ≤ 0.20 / `dup_para_char_frac` ≤ 0.20:
    *     the characters of those beyond-first occurrences over all
    *     line/paragraph characters
    *   - `top_{2,3,4}gram_char_frac` ≤ 0.20/0.18/0.16: characters
    *     covered by the most frequent word n-gram (its count × its
    *     token chars; ties on count break to the longest gram) over
    *     all token characters
    *   - `rep_{5..10}gram_char_frac` ≤ 0.15/0.14/0.13/0.12/0.11/0.10:
    *     characters of ALL occurrences of n-grams appearing more than
    *     once, over all token characters (overlaps counted per
    *     occurrence — the simple published form, so the ratio can
    *     exceed 1 on degenerate spam, which is exactly what it gates)
    *
    * Tokens are the same lowercased whitespace split the other text
    * operators use; gram characters exclude the joiner spaces. Scale
    * shape: one keyed explode + groupBy per level (lines, paragraphs,
    * one (n, gram) explode covering n = 2..10) — no per-doc quadratic
    * driver work, shuffles keyed by document throughout. Documents
    * whose text yields no tokens/lines are unscorable: fractions null,
    * verdict FALSE (fail closed, as [[gopherRules]] does). */
  def gopherRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def dupStats(elems: DataFrame, p: String): DataFrame =
      elems.groupBy(col(idCol), col("__e")).agg(count(lit(1)).as("__c"))
        .groupBy(col(idCol)).agg(
          round((sum(col("__c")) - count(lit(1))).cast("double") /
            sum(col("__c")), 6).as(s"dup_${p}_frac"),
          round(sum((col("__c") - 1) * length(col("__e"))).cast("double") /
            sum(col("__c") * length(col("__e"))), 6).as(s"dup_${p}_char_frac"))
    def exploded(sep: String): DataFrame = df.select(col(idCol),
      explode(filter(transform(split(col(textCol), sep), e => trim(e)),
        e => length(e) > 0)).as("__e"))
    val lineStats = dupStats(exploded("\n"), "line")
    val paraStats = dupStats(exploded("\n{2,}"), "para")

    val toks = tokens(col(textCol))
    val base = df.select(col(idCol), toks.as("__t"),
      aggregate(toks, lit(0L), (a, t) => a + length(t)).as("__tc"))
    val gramRows = base.select(col(idCol), col("__tc"), explode(expr(
      "flatten(transform(sequence(2, 10), n -> " +
        "IF(size(__t) >= n, transform(sequence(0, size(__t) - n), i -> " +
        "named_struct('n', n, 'g', concat_ws(' ', slice(__t, i + 1, n)), " +
        "'glen', length(concat_ws('', slice(__t, i + 1, n))))), " +
        "cast(array() as array<struct<n:int,g:string,glen:int>>))))"))
      .as("__gr"))
      .select(col(idCol), col("__tc"), col("__gr.n").as("__n"),
        col("__gr.g").as("__g"), col("__gr.glen").cast("long").as("__glen"))
    val counts = gramRows
      .groupBy(col(idCol), col("__tc"), col("__n"), col("__g"), col("__glen"))
      .agg(count(lit(1)).as("__c"))
    val perN = counts.groupBy(col(idCol), col("__tc"), col("__n")).agg(
      sum(when(col("__c") > 1, col("__c") * col("__glen")).otherwise(0L))
        .as("__rep"),
      max(struct(col("__c"), col("__glen"))).as("__m"))
      .select(col(idCol), col("__n"),
        round(col("__rep").cast("double") / col("__tc"), 6).as("__repf"),
        round((col("__m.__c") * col("__m.__glen")).cast("double") / col("__tc"), 6)
          .as("__topf"))
    def pick(n: Int, c: Column): Column = max(when(col("__n") === n, c))
    val gramStats = perN.groupBy(col(idCol)).agg(
      pick(2, col("__topf")).as("top_2gram_char_frac"),
      pick(3, col("__topf")).as("top_3gram_char_frac"),
      pick(4, col("__topf")).as("top_4gram_char_frac"),
      pick(5, col("__repf")).as("rep_5gram_char_frac"),
      pick(6, col("__repf")).as("rep_6gram_char_frac"),
      pick(7, col("__repf")).as("rep_7gram_char_frac"),
      pick(8, col("__repf")).as("rep_8gram_char_frac"),
      pick(9, col("__repf")).as("rep_9gram_char_frac"),
      pick(10, col("__repf")).as("rep_10gram_char_frac"))

    val out = df.select(col(idCol))
      .join(lineStats, Seq(idCol), "left")
      .join(paraStats, Seq(idCol), "left")
      .join(gramStats, Seq(idCol), "left")
    // short docs produce no n-grams at some n: absent rows mean "no
    // repetition possible there" — a zero fraction, not unscorable
    val zeroed = Seq(
      "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
      "rep_5gram_char_frac", "rep_6gram_char_frac", "rep_7gram_char_frac",
      "rep_8gram_char_frac", "rep_9gram_char_frac", "rep_10gram_char_frac")
      .foldLeft(out)((d, c) => d.withColumn(c,
        when(col("dup_line_frac").isNotNull, coalesce(col(c), lit(0.0)))))
    zeroed.withColumn("gopher_rep_pass", coalesce(
      col("dup_line_frac") <= 0.30 && col("dup_para_frac") <= 0.30 &&
        col("dup_line_char_frac") <= 0.20 && col("dup_para_char_frac") <= 0.20 &&
        col("top_2gram_char_frac") <= 0.20 && col("top_3gram_char_frac") <= 0.18 &&
        col("top_4gram_char_frac") <= 0.16 && col("rep_5gram_char_frac") <= 0.15 &&
        col("rep_6gram_char_frac") <= 0.14 && col("rep_7gram_char_frac") <= 0.13 &&
        col("rep_8gram_char_frac") <= 0.12 && col("rep_9gram_char_frac") <= 0.11 &&
        col("rep_10gram_char_frac") <= 0.10, lit(false)))
  }

  /** Line-end punctuation C4 accepts (Raffel et al. 2020 §2.2): a
    * period, exclamation mark, question mark, or closing quotation
    * mark. */
  val C4TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"", "”")

  /** The published C4 cleaning rules (Raffel et al. 2020 §2.2) — the
    * line-level complement to [[gopherRules]]'s document statistics.
    * Per document, one pure-projection pass computes:
    *
    *   - the LINE FILTER: a line survives when it ends in terminal
    *     punctuation, carries at least `minLineWords` words, and does
    *     not mention "javascript" (case-insensitive); `text_clean` is
    *     the surviving lines rejoined in order
    *   - the PAGE GATES: at least `minSentences` sentence terminators
    *     (`[.!?]`) in the cleaned text, no "lorem ipsum" phrase, no
    *     curly bracket, and no token from the `badWords` policy list
    *     (the paper uses the public "Dirty, Naughty, Obscene or
    *     Otherwise Bad Words" list — supplied by the caller, not
    *     shipped)
    *
    * Output: (idCol, n_lines, n_kept_lines, n_sentences, has_lorem,
    * has_brace, bad_word_hits, c4_pass, text_clean). All plain
    * array/string expressions — codegen'd, no shuffle, every number
    * replayable in the DuckDB oracle (`c4_rules`). C4's three-sentence
    * span dedup is deliberately not re-implemented here:
    * [[graft.dedup.Dedup]]'s span machinery already covers it at scale. */
  def c4Rules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLineWords: Int = 3,
      minSentences: Int = 5,
      badWords: Seq[String] = Nil): DataFrame = {
    val lines = filter(
      transform(split(col(textCol), "\n"), l => trim(l)),
      l => length(l) > 0)
    def lineWords(l: Column): Column =
      size(filter(split(l, "\\s+"), w => length(w) > 0))
    def keepLine(l: Column): Column =
      substring(l, -1, 1).isin(C4TerminalPunct: _*) &&
        lineWords(l) >= minLineWords &&
        !lower(l).contains("javascript")
    val kept = filter(lines, l => keepLine(l))
    val textClean = concat_ws("\n", kept)
    val words = filter(split(col(textCol), "\\s+"), w => length(w) > 0)
    val badHits =
      if (badWords.isEmpty) lit(0L)
      else size(array_intersect(
        array_distinct(transform(words, w => lower(w))),
        lit(badWords.toArray))).cast("long")
    df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      regexp_count(textClean, lit("[.!?]")).cast("long").as("n_sentences"),
      lower(col(textCol)).contains("lorem ipsum").as("has_lorem"),
      (col(textCol).contains("{") || col(textCol).contains("}")).as("has_brace"),
      badHits.as("bad_word_hits"),
      textClean.as("text_clean"))
      .withColumn("c4_pass",
        col("n_sentences") >= minSentences &&
          !col("has_lorem") && !col("has_brace") &&
          col("bad_word_hits") === 0)
      .select(col(idCol), col("n_lines"), col("n_kept_lines"),
        col("n_sentences"), col("has_lorem"), col("has_brace"),
        col("bad_word_hits"), col("c4_pass"), col("text_clean"))
  }

  /** Unicode normalization (NFC/NFD/NFKC/NFKD via the JDK's UAX #15
    * implementation) with stray control characters stripped — the first
    * cleaning step of a text corpus: composes combining-mark encodings,
    * folds compatibility/fullwidth variants (NFKC/NFKD), and removes the
    * C0/C1 bytes that poison dedup hashes and tokenizer vocabularies.
    * Codegen'd expression, no UDF boundary. NFKC is the curation
    * default; NFC has a DuckDB twin and is the oracle-checked form. */
  def normalizeText(c: Column, form: String = "NFKC"): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.NormalizeText(
        org.apache.spark.sql.graft.Bridge.expression(c.cast("string")), form))

  /** 64-bit document fingerprint: xxhash64 of the normalized text. */
  def fingerprint(c: Column): Column =
    xxhash64(lower(trim(regexp_replace(c, "\\s+", " "))))

  /** Winnowing-style robust fingerprint: min over word-shingle hashes —
    * stable under small edits away from the minimum shingle. Tokenizes
    * the SAME whitespace-normalized text as [[fingerprint]] (Spark trim
    * strips only spaces, so a tab-leading doc would otherwise grow a
    * phantom empty first token and two fingerprint-equal docs could
    * shingle-differ — the invariant the fingerprints query asserts). */
  def shingleFingerprint(c: Column, k: Int = 5): Column = {
    val toks = split(lower(trim(regexp_replace(c, "\\s+", " "))), " ")
    val n = size(toks)
    val shingles = transform(
      sequence(lit(0), greatest(n - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + lit(1), lit(k))))
    array_min(transform(shingles, s => xxhash64(s)))
  }

  /** Split documents into overlapping token-window chunks — the standard
    * context-window preparation step of an LLM training pipeline. Chunk c
    * starts at token c·(chunkTokens − overlap) and carries up to
    * `chunkTokens` tokens; the final chunk may be shorter. A trailing start
    * whose remaining tokens all lie inside the previous chunk's overlap
    * region is SKIPPED — it would emit a chunk fully contained in its
    * predecessor, duplicating training text. Pure column expressions
    * (sequence + filter + slice + posexplode): one scan, no shuffle —
    * chunking 100 TB is a projection. Output: (id, chunk_id, chunk_text,
    * n_chunk_tokens). */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got chunkTokens=$chunkTokens overlap=$overlap")
    val step = chunkTokens - overlap
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // blank documents yield zero chunks (split(trim("")) is [""], which
    // would otherwise emit one junk empty chunk — tokenCount's blank→0
    // convention applies here too); posexplode of an empty array drops the row
    val starts = when(length(trim(col(textCol))) === 0, array().cast("array<int>"))
      .otherwise(filter(
        sequence(lit(0), greatest(n - 1, lit(0)), lit(step)),
        s => s === 0 || (n - s) > overlap))
    df.select(
        col(idCol),
        col(textCol),
        posexplode(transform(starts, s =>
          struct(
            concat_ws(" ", slice(toks, s + 1, lit(chunkTokens))).as("chunk_text"),
            least(lit(chunkTokens), n - s).as("n_chunk_tokens")))))
      .select(
        col(idCol),
        col("pos").cast("int").as("chunk_id"),
        col("col.chunk_text"),
        col("col.n_chunk_tokens"))
  }

  /** Keep documents whose quality score clears the threshold — the
    * standard corpus filter between dedup and chunking. Pure filter
    * expression: fused into the scan, pushdown-friendly. */
  def qualityFilter(df: DataFrame, textCol: String, minQuality: Double): DataFrame =
    df.filter(qualityScore(col(textCol)) >= minQuality)

  /** Per-source curation rollup — the domain-level decision table of web
    * curation (keep / drop / downsample a whole SOURCE before paying any
    * per-document work): document, token, and char volume, mean quality,
    * low-quality share, distinct languages. One map-side-combinable
    * groupBy of pure column expressions; source cardinality is bounded
    * (hosts / domains / crawls), so the output is tiny at any corpus
    * size and the shuffle carries only partial aggregates. */
  def sourceQualityReport(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      langCol: String,
      minQuality: Double = 0.75): DataFrame = {
    val q = qualityScore(col(textCol))
    df.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        round(avg(q), 6).as("mean_quality"),
        sum(when(q < minQuality, 1L).otherwise(0L)).as("n_low_quality"),
        countDistinct(col(langCol)).as("n_langs"))
  }

  /** Corpus data card — the release composition table every published
    * training corpus ships: one row per language with volume shares,
    * length percentiles, quality, and exact-duplicate / empty-doc rates.
    *
    * Scale shape: ONE wide aggregation pass over the corpus (count /
    * sums / distinct-md5 / quality mean / length percentile sketches all
    * in the same groupBy); the share denominators aggregate the
    * language-cardinality result and broadcast back — the two uses of the
    * per-language aggregate share one Exchange (ReuseExchange), so the
    * corpus is scanned once. Duplicate identity is md5 of the text,
    * scoped per language (run [[normalizeText]] first to fold equivalent
    * encodings). Percentiles default to the mergeable sketch;
    * `exactPercentiles` is for oracle parity at small SF. */
  def corpusDataCard(
      df: DataFrame,
      textCol: String,
      langCol: String,
      exactPercentiles: Boolean = false): DataFrame = {
    val toks = tokenCount(col(textCol)).cast("long")
    val chars = length(col(textCol)).cast("long")
    val perLang = df.groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(toks).as("n_tokens"),
        sum(chars).as("n_chars"),
        // one sketch per group queried at both probes (r21, guide §2.3)
        // — same inserts as two scalar calls, bit-identical answers,
        // half the aggregation-buffer work
        graft.Exprs.pctArray(chars.cast("double"), Seq(0.5, 0.95), exactPercentiles)
          .as("__p_chars"),
        round(avg(qualityScore(col(textCol))), 6).as("mean_quality"),
        countDistinct(md5(col(textCol))).as("__distinct_texts"),
        sum(when(toks === 0L, 1L).otherwise(0L)).as("n_empty"))
    val totals = perLang.agg(
      sum(col("n_docs")).as("__t_docs"), sum(col("n_tokens")).as("__t_tokens"))
    perLang
      .crossJoin(broadcast(totals))
      .select(
        col(langCol),
        col("n_docs"),
        round(col("n_docs") / col("__t_docs"), 6).as("doc_share"),
        col("n_tokens"),
        round(col("n_tokens") / col("__t_tokens"), 6).as("token_share"),
        col("n_chars"),
        element_at(col("__p_chars"), 1).as("p50_chars"),
        element_at(col("__p_chars"), 2).as("p95_chars"),
        col("mean_quality"),
        (col("n_docs") - col("__distinct_texts")).as("n_exact_dups"),
        col("n_empty"))
  }

  /** Corpus vocabulary: top-k tokens by frequency (ties by token
    * ascending). One explode + hash-partitioned groupBy + distributed
    * partial top-k (TakeOrderedAndProject) — no full sort, no driver-side
    * token set. */
  def topTokens(df: DataFrame, textCol: String, k: Int, minLength: Int = 1): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= minLength)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token"))
      .limit(k)

  /** Approximate corpus heavy hitters in bounded memory: candidate tokens
    * from a deterministic uniform OCCURRENCE sample, estimated counts from
    * a count-min sketch built over the full corpus (mergeable, eps·N
    * additive overestimate with prob. ≥ confidence — never an undercount).
    * For when the exact [[topTokens]] groupBy is unwanted: the sketch's
    * memory is O(1/eps · ln(1/(1−confidence))) regardless of vocabulary
    * size, where a 100 TB web corpus's exact token groupBy shuffles a
    * multi-billion-row vocabulary. Two passes over the tokenized corpus
    * (candidates, then sketch), driver assembles ≤ k rows.
    *
    * The sample is ordered by a hash of the occurrence IDENTITY
    * (document-content hash, token position) — NOT of the token value:
    * hashing the value would pick a fixed set of lowest-hash tokens
    * regardless of frequency, and the true heavies would almost surely be
    * absent at scale. Hashing occurrences makes a frequent token appear
    * in the sample with probability proportional to its count (test).
    * Determinism: sketch seeded, occurrence hash content-derived. */
  def heavyHittersApprox(
      df: DataFrame,
      textCol: String,
      k: Int,
      sampleSize: Int = 10000,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def toks = df.select(
      xxhash64(col(textCol), lit(seed)).as("__doc"),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "token")))
    val candidates = toks
      .orderBy(xxhash64(col("__doc"), col("__pos"))) // uniform over occurrences
      .limit(sampleSize)
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(k * 4) // oversample candidates
      .select("token").as[String].collect()
    val sketch = toks.stat.countMinSketch(col("token"), eps, confidence, seed)
    candidates
      .map(t => (t, sketch.estimateCount(t)))
      .sortBy { case (t, c) => (-c, t) }
      .take(k)
      .toSeq.toDF("token", "est_freq")
  }

  /** Oracle-checkable heavy-hitters audit: the exact top-k tokens (ground
    * truth any engine reproduces) each audited against the same seeded
    * count-min sketch [[heavyHittersApprox]] builds. `est_ok` holds iff
    * exact <= estimate <= exact + ceil(eps·N) — a CMS never undercounts,
    * and overcounts beyond eps·N with prob < 1−confidence. Both the top-k
    * set and the flag are pure functions of data + seed, so an external
    * oracle can assert the counts exactly and the flag as literal true;
    * a broken sketch (undercount, unseeded hash, dropped rows) flips the
    * flag and fails the comparison. Two passes: one exact token groupBy
    * (the answer, shuffled; use [[heavyHittersApprox]] when the
    * vocabulary itself is too big for that) + one sketch aggregation. */
  def heavyHittersCheck(
      df: DataFrame,
      textCol: String,
      k: Int,
      eps: Double = 0.001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    def toks = df.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= 1)
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), asc("token")).limit(k)
      .as[(String, Long)].collect() // <= k rows of learned state
    val sketch = toks.stat.countMinSketch(col("token"), eps, confidence, seed)
    val bound = math.ceil(eps * sketch.totalCount()).toLong
    exact.toSeq
      .map { case (t, n) =>
        val est = sketch.estimateCount(t)
        (t, n, est >= n && est <= n + bound)
      }
      .toDF("token", "freq", "est_ok")
  }

  /** Top-k TF-IDF terms per document: tf = in-document token count,
    * idf = ln((N + 1) / (df + 1)) (smoothed — a token in every document
    * still gets a positive weight, and a cold-start df of 0 can't divide
    * by zero), N = documents in `df`.
    *
    * Scale shape: explode → groupBy (doc, token) for tf, groupBy token for
    * df, one shuffle join on token (token cardinality ≪ corpus bytes), and
    * the per-document top-k runs as a window PARTITIONED BY document —
    * millions of small partitions, no global sort. N is the one learned
    * scalar (a count, not a collect).
    *
    * Ranking key is round(tfidf, 6) with token-ascending tiebreak so the
    * selected top-k set is reproducible across engines and runs — raw
    * doubles differ in the last ulp between ln() implementations, which
    * would otherwise flip neighbors at the k boundary. */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      minLength: Int = 2): DataFrame = {
    val n = df.count()
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= minLength)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(docFreq, Seq("token"))
      .withColumn(
        "tfidf",
        round(col("tf") * log((lit(n) + 1.0) / (col("df") + 1.0)), 6))
    // Bounded-heap top-k (TopKStructs via topKPerKeyDirectional): each map
    // partition reduces to ≤ k rows per doc before the exchange, so the
    // shuffle carries the per-doc shortlists, not the full scored
    // (doc, token) frame a row_number window would exchange and sort.
    graft.dp.TopK
      .topKPerKeyDirectional(
        scored, Seq(idCol), Seq("tfidf" -> false, "token" -> true), k)
      .select(
        col(idCol), col("rank").as("rn"),
        col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Top-k BM25 terms per document — TF-IDF's retrieval-grade sibling with
    * term-frequency saturation (k1) and document-length normalization (b):
    * score = ln(1 + (N - df + 0.5)/(df + 0.5))
    *         * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    * The always-positive idf variant; a long document repeating a token
    * stops gaining score where raw TF-IDF grows linearly — the relevance
    * scoring a curation pipeline wants for query-anchored filtering.
    *
    * Scale shape matches [[tfidfTopTerms]]: explode → (doc,token) tf →
    * token df → joins on token/doc, bounded-heap per-doc top-k aggregate.
    * Learned scalars are N and avgdl (exact long sum / count — no
    * float-accumulated average, so the constant is bit-reproducible).
    * Ranking key round(bm25, 6) + token tiebreak, reproducible across
    * engines. */
  def bm25TopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 5,
      minLength: Int = 2,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val n = df.count()
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= minLength)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val totals = dl.agg(sum(col("dl")), count(lit(1))).head()
    require(!totals.isNullAt(0), "bm25TopTerms: corpus has no tokens")
    val avgdl = totals.getLong(0).toDouble / totals.getLong(1)
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val k1c = lit(k1)
    val idf = log((lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val sat = (col("tf") * (k1c + lit(1.0))) /
      (col("tf") + k1c * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    val scored = tf
      .join(docFreq, Seq("token"))
      .join(dl, Seq(idCol))
      .withColumn("bm25", round(idf * sat, 6))
    // Same bounded-heap shape as tfidfTopTerms: the exchange ships k rows
    // per doc, not every scored token row.
    graft.dp.TopK
      .topKPerKeyDirectional(
        scored, Seq(idCol), Seq("bm25" -> false, "token" -> true), k)
      .select(
        col(idCol), col("rank").as("rn"),
        col("token"), col("tf"), col("df"), col("dl"), col("bm25"))
  }

  /** PII redaction for corpus curation: emails, URLs, and phone-like
    * number runs replaced with typed placeholder tokens. Pure chained
    * regexp_replace — codegen'd, fused into the scan projection, linear in
    * bytes. Order matters: URLs first (an email-looking userinfo inside a
    * URL must redact as part of the URL), then emails, then phones. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  def redactPii(c: Column): Column = {
    val noUrl = regexp_replace(c, UrlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailRe, "<EMAIL>")
    regexp_replace(noEmail, PhoneRe, "<PHONE>")
  }

  /** Count of PII matches per kind (what a redaction report aggregates). */
  def piiCounts(c: Column): (Column, Column, Column) =
    (regexp_count(c, lit(UrlRe)),
      regexp_count(regexp_replace(c, UrlRe, "<URL>"), lit(EmailRe)),
      regexp_count(regexp_replace(regexp_replace(c, UrlRe, "<URL>"), EmailRe, "<EMAIL>"), lit(PhoneRe)))

  /** Repetition (quality) signals per document, in the spirit of the
    * Gopher/MassiveText duplicate-fraction filters: the fraction of
    * repeated tokens and repeated word-3-grams. Pure array expressions —
    * no explode, no shuffle, one projection over the scan. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nd = size(array_distinct(toks))
    val g3Total = greatest(n - 2, lit(0))
    val g3Distinct = when(n >= 3, size(graft.dedup.Dedup.shingles(col(textCol), 3))).otherwise(0)
    df.select(
      col(idCol),
      n.as("n_tokens"),
      round(when(n > 0, lit(1.0) - nd.cast("double") / n).otherwise(0.0), 6)
        .as("dup_token_ratio"),
      round(when(g3Total > 0, lit(1.0) - g3Distinct.cast("double") / g3Total).otherwise(0.0), 6)
        .as("dup_3gram_ratio"))
  }

  /** Corpus-unigram negative log-probability per document — the cheap
    * proxy for LM-perplexity quality filtering (CCNet-style): documents
    * made of corpus-typical tokens score low, documents of rare junk
    * tokens score high. Within-corpus scoring has no OOV, so no smoothing
    * term distorts the estimate.
    *
    * Scale: one token frequency groupBy (the LM), one shuffle join of
    * tokens to frequencies (token cardinality ≪ corpus bytes), the corpus
    * total attached as a broadcast 1-row frame — no global window, no
    * driver-side vocabulary. */
  def unigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLength: Int = 1): DataFrame = {
    val toks = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= minLength)
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
    val total = vocab.agg(sum(col("n")).as("total"))
    toks
      .join(vocab, Seq("token"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(-log(col("n") / col("total").cast("double"))), 6).as("avg_neg_logprob"))
  }

  /** Bigram LM quality score: average negative conditional log-probability
    * -log P(w2|w1) of each document's adjacent token pairs, with bigram
    * and context counts learned from the corpus itself (like
    * [[unigramLogProb]], within-corpus scoring has no OOV). The
    * denominator is the corpus-wide unigram count of w1 — the standard
    * within-corpus approximation (exact context counts differ only by
    * each document's final token). Repetitive/templated text scores LOW
    * (its bigrams are corpus-frequent); incoherent token soup scores HIGH
    * even when its unigrams are common — the signal the unigram score
    * can't see. Documents with fewer than two tokens drop out (no
    * bigrams).
    *
    * Scale: bigram adjacency already exists inside each document's token
    * ARRAY, so grams derive array-side (an indexed `transform` over the
    * hashed token array) — no per-doc window, no Exchange just to
    * recover neighbours; only the count groupBys shuffle. Tokens collapse
    * to 64-bit hashes BEFORE any exchange, so counts and joins all
    * shuffle long keys instead of string pairs (~2x end to end at sf0.1 —
    * same lesson as the WordShingleHashes kernel; a cross-vocabulary
    * xxhash64 collision would merge two gram counts, at ~|vocab|²/2⁶⁴
    * odds). Same shape as unigramLogProb. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // spread before tokenize+hash — same single-split-scan rationale as
    // ngramLogProb's harr
    val hashed = graft.dp.Partitioning
      .spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        transform(tokens(col(textCol)), t => xxhash64(t)).as("__hs"))
    val bi = hashed
      .select(col(idCol), explode(expr(
        "transform(__hs, (x, i) -> struct(" +
          "IF(i >= 1, __hs[i-1], CAST(NULL AS BIGINT)) AS h1, x AS h2))"))
        .as("__b"))
      .select(col(idCol), col("__b.h1").as("h1"), col("__b.h2").as("h2"))
      .filter(col("h1").isNotNull)
    val bigramCounts = bi.groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("nb"))
    val unigramCounts = hashed.select(explode(col("__hs")).as("h1"))
      .groupBy(col("h1")).agg(count(lit(1)).as("nu"))
    bi
      .join(bigramCounts, Seq("h1", "h2"))
      .join(unigramCounts, Seq("h1"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("nb").cast("double") / col("nu"))), 6).as("avg_neg_logprob"))
  }

  /** Stupid-backoff trigram language-model scores (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the web-scale LM
    * quality filter): count n-grams on a REFERENCE corpus, score a
    * candidate corpus against them. Per scored trigram
    * `p = c3/c2 | α·c(w2w3)/c(w2) | α²·c(w3)/N` (first defined level;
    * unseen unigrams floor at `0.5/N` so the log stays finite), per doc
    * the mean negative log — low means reference-like text, high means
    * off-distribution junk. Unlike [[bigramLogProb]] (self-scored
    * repetition signal) the two-corpus form is the filtering shape:
    * candidate docs with unseen n-gram mass pay the backoff penalty.
    *
    * The 3-gram special case of [[ngramLogProb]] (kept as the named
    * entry point — CCNet-faithful filtering wants order 5, this is the
    * cheap order). Output: idCol, `n_trigrams`, `avg_neg_logprob`
    * (docs under 3 tokens are absent). */
  def trigramLogProb(
      reference: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      alpha: Double = 0.4): DataFrame =
    ngramLogProb(reference, docs, idCol, textCol, order = 3, alpha)
      .withColumnRenamed("n_ngrams", "n_trigrams")

  /** Stupid-backoff order-n language-model scores — the general form of
    * [[trigramLogProb]] (which delegates here at order 3). Order 5 is
    * the default: CCNet's published perplexity filter uses a 5-gram
    * KenLM, and stupid backoff is the web-scale stand-in for Kneser-Ney
    * at that order (Brants et al. 2007). Per scored full n-gram the
    * first defined backoff level wins:
    * `p = α^(n-k) · c_k(suffix_k) / c_{k-1}(context of suffix_k)` for
    * k = n..2, else `α^(n-1) · c_1(w) / N` with unseen unigrams floored
    * at `0.5/N`.
    *
    * Scale shape: adjacency derives ARRAY-SIDE (one indexed `transform`
    * over each doc's hashed token array — no per-doc window Exchange).
    * Every k-gram collapses to ONE xxhash64 key over its component
    * hashes before any exchange, so all 2n-1 count joins are single
    * 64-bit-key equi-joins and the count tables shuffle (long, long)
    * rows — never token strings, never k-wide tuples (a cross-gram
    * collision merges two counts at ~|grams|²/2⁶⁴ odds, the library's
    * standard hashing disclosure). One reference scan builds all n
    * count tables; pre-tokenize and persist the reference when scoring
    * repeatedly. Output: (idCol, `n_ngrams`, `avg_neg_logprob`) — docs
    * with fewer than `order` tokens are absent. */
  def ngramLogProb(
      reference: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      order: Int = 5,
      alpha: Double = 0.4): DataFrame = {
    require(order >= 2 && order <= 8, s"order must be in [2, 8], got $order")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    // spread the RAW text frames before tokenizing: a single-file corpus
    // scan otherwise runs the whole tokenize + 2n-1-hashes-per-token
    // gram kernel in one task (profiled: the 0.7-1.1 s single-task jobs
    // of ngram_logprob / perplexity_buckets at sf0.1); no-op on
    // realistically-partitioned inputs
    def harr(df: DataFrame): DataFrame = graft.dp.Partitioning
      .spread(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__id"),
        transform(tokens(col(textCol)), t => xxhash64(t)).as("__hs"))
    // per position i: g_j = key of the j-gram ENDING at i (j = 1..order),
    // d_j = key of the (j-1)-gram ending at i-1 — the backoff
    // denominator's context key (j = 2..order)
    val fields = ((1 to order).map { j =>
      val args = (j - 1 to 0 by -1).map(o => s"__hs[i-$o]").mkString(", ")
      s"IF(i >= ${j - 1}, xxhash64($args), CAST(NULL AS BIGINT)) AS g$j"
    } ++ (2 to order).map { j =>
      val args = (j - 1 to 1 by -1).map(o => s"__hs[i-$o]").mkString(", ")
      s"IF(i >= ${j - 1}, xxhash64($args), CAST(NULL AS BIGINT)) AS d$j"
    }).mkString(", ")
    def grams(h: DataFrame): DataFrame = h
      .select(col("__id"),
        explode(expr(s"transform(__hs, (x, i) -> struct($fields))")).as("__g"))
      .select(col("__id") +:
        ((1 to order).map(j => col(s"__g.g$j")) ++
          (2 to order).map(j => col(s"__g.d$j"))): _*)
    val ref = harr(reference)
    val n = ref.select(explode(col("__hs")).as("h"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val refG = grams(ref)
    val counts: Map[Int, DataFrame] = (1 to order).map { j =>
      j -> refG.filter(col(s"g$j").isNotNull)
        .groupBy(col(s"g$j").as("__k")).agg(count(lit(1)).as("__c"))
    }.toMap
    val scored = grams(harr(docs)).filter(col(s"g$order").isNotNull)
    val numerated = (1 to order).foldLeft(scored) { (d, j) =>
      d.join(counts(j).select(col("__k").as(s"g$j"), col("__c").as(s"__n$j")),
        Seq(s"g$j"), "left")
    }
    val joined = (2 to order).foldLeft(numerated) { (d, j) =>
      d.join(counts(j - 1).select(col("__k").as(s"d$j"), col("__c").as(s"__d$j")),
        Seq(s"d$j"), "left")
    }.crossJoin(broadcast(n))
    // α^k by repeated left-multiplication — the double the oracle's
    // left-associative `α*α*…*c/d` SQL produces, bit for bit
    def pow(k: Int): Double = Iterator.fill(k)(alpha).foldLeft(1.0)(_ * _)
    val base = lit(pow(order - 1)) *
      coalesce(col("__n1").cast("double"), lit(0.5)) / col("__n")
    // foldLeft from j=2 up leaves the HIGHEST order as the outermost when
    val chain = (2 to order).foldLeft(base) { (acc, j) =>
      when(col(s"__n$j").isNotNull,
        lit(pow(order - j)) * col(s"__n$j").cast("double") / col(s"__d$j"))
        .otherwise(acc)
    }
    joined
      .select(col("__id"), chain.as("__p"))
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("n_ngrams"),
        round(avg(-log(col("__p"))), 6).as("avg_neg_logprob"))
      .withColumnRenamed("__id", idCol)
  }

  /** Tokenizer evaluation report — the numbers a tokenizer card states:
    * FERTILITY (tokens per word; 1.0 = every word is one token, the
    * saturation floor) and COMPRESSION (bytes per token) per group
    * (typically language — fertility imbalance across languages is the
    * classic multilingual-tokenizer defect this table exposes).
    *
    * Input is any encoded frame carrying the tokenizer-agnostic
    * `n_tokens` contract (BPE / Unigram / WordPiece all emit it), plus
    * the original text column; word/char/byte totals come from the SAME
    * pre-tokenization the tokenizer used. One wide aggregate per group
    * — a |groups|-row result, no per-doc state. */
  def tokenizerFertility(
      encoded: DataFrame,
      textCol: String,
      groupCol: Option[String] = None,
      preTokenize: String = Bpe.Whitespace): DataFrame = {
    val ws = Bpe.wordsOf(textCol, preTokenize)
    val g = groupCol.getOrElse("scope")
    val base = (groupCol match {
      case Some(_) => encoded
      case None    => encoded.withColumn(g, lit("all"))
    }).select(col(g),
      size(ws).cast("long").as("__w"),
      aggregate(ws, lit(0L), (a, x) => a + length(x)).as("__ch"),
      aggregate(ws, lit(0L), (a, x) => a + octet_length(x)).as("__by"),
      col("n_tokens").cast("long").as("__tk"))
    base.groupBy(col(g)).agg(
      count(lit(1)).as("n_docs"),
      sum(col("__w")).as("total_words"),
      sum(col("__tk")).as("total_tokens"),
      sum(col("__ch")).as("total_chars"),
      sum(col("__by")).as("total_bytes"),
      round(sum(col("__tk")).cast("double") / sum(col("__w")), 6)
        .as("fertility"),
      round(sum(col("__by")).cast("double") / sum(col("__tk")), 6)
        .as("bytes_per_token"))
  }

  /** Tokenizer release data card — one tall `(section, key, n, value)`
    * table rolling up what a tokenizer release ships (the
    * [[corpusDataCard]] precedent for the tokenizer lane): VOCAB
    * composition (size, byte-fallback entries), CORPUS COVERAGE (OOV
    * token-occurrence rate against the vocab, distinct OOV types,
    * byte-fallback usage rate), and the per-language FERTILITY and
    * COMPRESSION rows of [[tokenizerFertility]]. `n` is the row/token
    * count backing each stat so every row is self-contained.
    *
    * `encoded` carries the tokenizer-agnostic contract (`tokensCol`
    * ARRAY<STRING> + `n_tokens`) plus the original text; `vocab` is the
    * released token table ([[Bpe.vocabWithIds]] / WordPiece / Unigram
    * shape — only `vocabTokenCol` is read). Byte-fallback entries are
    * recognized by the library's `<0xNN>` surface ([[Bpe.byteToken]]),
    * with or without the word-final `</w>` marker
    * ([[Bpe.ByteTokenCountPat]]) — BPE vocabs ship both forms per byte.
    *
    * Scale shape: pure composition — one count over the bounded vocab,
    * one explode + broadcast-vocab join + wide aggregate over the
    * corpus for coverage, and the [[tokenizerFertility]] single-pass
    * group aggregate; sections union into a tiny tall frame. */
  def tokenizerDataCard(
      encoded: DataFrame,
      textCol: String,
      langCol: String,
      vocab: DataFrame,
      vocabTokenCol: String = "token",
      tokensCol: String = "tokens",
      preTokenize: String = Bpe.Whitespace): DataFrame = {
    // counts BOTH byte-token surfaces — bare <0xNN> and word-final
    // <0xNN></w> (the vocab ships both per byte; word-final fallback
    // bytes in an encoded stream carry the marker) — see Bpe.ByteTokenCountPat
    val bytePat = Bpe.ByteTokenCountPat
    def row(section: String, key: Column, n: Column, value: Column) =
      struct(lit(section).as("section"), key.cast("string").as("key"),
        n.cast("long").as("n"), round(value.cast("double"), 6).as("value"))
    val vocabSec = vocab
      .agg(
        count(lit(1)).as("__v"),
        sum(when(col(vocabTokenCol).rlike(bytePat), 1L).otherwise(0L)).as("__b"))
      .select(explode(array(
        row("vocab", lit("vocab_size"), col("__v"), col("__v")),
        row("vocab", lit("byte_fallback_tokens"), col("__b"), col("__b")))).as("r"))
      .select(col("r.*"))
    val inVocab = vocab.select(col(vocabTokenCol).as("__tok")).distinct()
      .withColumn("__in", lit(1))
    val coverageSec = encoded
      .select(explode(col(tokensCol)).as("__tok"))
      .join(broadcast(inVocab), Seq("__tok"), "left")
      .agg(
        count(lit(1)).as("__total"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("__oov"),
        countDistinct(col("__tok")).as("__types"),
        countDistinct(when(col("__in").isNull, col("__tok"))).as("__oovTypes"),
        sum(when(col("__tok").rlike(bytePat), 1L).otherwise(0L)).as("__bf"))
      .select(explode(array(
        row("coverage", lit("oov_token_rate"), col("__total"),
          col("__oov").cast("double") / col("__total")),
        row("coverage", lit("oov_token_types"), col("__types"), col("__oovTypes")),
        row("coverage", lit("byte_fallback_rate"), col("__total"),
          col("__bf").cast("double") / col("__total")))).as("r"))
      .select(col("r.*"))
    val fert = tokenizerFertility(encoded, textCol, Some(langCol), preTokenize)
    val fertSec = fert
      .select(row("fertility", col(langCol), col("n_docs"), col("fertility")).as("r"))
      .select(col("r.*"))
    val compSec = fert
      .select(row("compression", col(langCol), col("total_tokens"),
        col("bytes_per_token")).as("r"))
      .select(col("r.*"))
    vocabSec.unionByName(coverageSec).unionByName(fertSec).unionByName(compSec)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * candidate document against a CLEAN reference corpus with the
    * stupid-backoff order-n LM ([[ngramLogProb]] — order 5 by default,
    * matching CCNet's published 5-gram KenLM filter), convert to
    * perplexity, and split each group (CCNet buckets per LANGUAGE) into
    * `nBuckets` quantile bands — head = lowest perplexity (most
    * reference-like), tail = highest. The head/middle/tail label is the
    * classic crawl-curation signal: train on head+middle, or weight by
    * band.
    *
    * Scale shape: the LM scoring is keyed joins against reference count
    * tables; the band assignment is [[graft.features.Binning.groupedBinning]]
    * — a |groups|×(nBuckets-1) edge frame joined back (broadcast-small),
    * never a per-group `ntile` sort of the corpus. Documents with fewer
    * than `order` tokens have no full n-grams and are absent from the
    * output (the LM cannot score them — gate them on length upstream).
    * Output: (idCol, [groupCol], n_ngrams, avg_neg_logprob,
    * perplexity, ppl_bucket) with ppl_bucket in head/middle/tail for
    * nBuckets = 3, else the numeric band as a string. */
  def perplexityBuckets(
      reference: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: Option[String] = None,
      nBuckets: Int = 3,
      order: Int = 5,
      alpha: Double = 0.4,
      exact: Boolean = false): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val scored = ngramLogProb(reference, docs, idCol, textCol, order, alpha)
      .withColumn("perplexity", round(exp(col("avg_neg_logprob")), 6))
    val g = groupCol.getOrElse("__g")
    val keyed = groupCol match {
      case Some(gc) => scored.join(docs.select(col(idCol), col(gc)), Seq(idCol))
      case None     => scored.withColumn(g, lit("all"))
    }
    val banded = graft.features.Binning
      .groupedBinning(keyed, g, "perplexity", nBuckets, exact)
    val labeled =
      if (nBuckets == 3)
        banded.withColumn("ppl_bucket",
          element_at(lit(Array("head", "middle", "tail")), col("bucket") + 1))
      else banded.withColumn("ppl_bucket", col("bucket").cast("string"))
    val cleaned = labeled.drop("bucket")
    (if (groupCol.isEmpty) cleaned.drop(g) else cleaned)
      .select(Seq(col(idCol)) ++ groupCol.map(col).toSeq ++ Seq(
        col("n_ngrams"), col("avg_neg_logprob"),
        col("perplexity"), col("ppl_bucket")): _*)
  }

  /** Inverted index: token → document frequency + a CAPPED posting list
    * (the `maxPostings` smallest doc ids, ascending) — the retrieval-side
    * artifact of a corpus (keyword search, contamination lookup, df
    * tables for BM25 serving).
    *
    * Scale shape: explode + (token, doc) distinct, then ONE groupBy per
    * token computing the count and the capped posting list together. The
    * posting list goes through the bounded-heap top-k aggregate, so a
    * stopword-like token appearing in a billion documents still
    * contributes at most `maxPostings` ids to the shuffle — collecting
    * uncapped postings (collect_set) would OOM on exactly the tokens a
    * real corpus has most of. `minDf` prunes the hapax tail after the
    * count (cheap — it's the same pass). */
  def invertedIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minLength: Int = 2,
      minDf: Long = 1,
      maxPostings: Int = 10): DataFrame = {
    val pairs = df
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) >= minLength)
      .distinct()
    pairs
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        graft.dp.TopK.topKAgg(maxPostings)((-col("__id")).as("i")).as("__post"))
      .filter(col("df") >= minDf)
      .select(
        col("token"),
        col("df"),
        transform(col("__post"), s => -s.getField("i")).as("postings"))
  }

  /** Lexical retrieval: for each query document (small set — the token
    * side is broadcast), the k corpus documents with the highest
    * whole-token-set Jaccard. The corpus side is one tokenize + distinct
    * + shared-token join — candidates are only the documents sharing at
    * least one token with a query, so the 100 TB shape is a broadcast
    * hash join streamed over the corpus scan, never an n×m score pass.
    * Ties rank deterministically by (jaccard DESC, id ASC), the same
    * contract as [[graft.similarity.Similarity.rankTopK]]. */
  def lexicalJaccardTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      textCol: String,
      queryIdCol: String,
      k: Int): DataFrame = {
    // the self-pair filter below compares corpus ids to query ids — a
    // lossy cross-family coercion (string vs long) would null out the
    // comparison and silently drop every candidate
    graft.similarity.Similarity.requireComparableIdTypes(
      corpus.schema(idCol).dataType, s"corpus id '$idCol'",
      queries.schema(queryIdCol).dataType, s"query id '$queryIdCol'")
    val cTok = corpus
      .select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .distinct()
    val qTok = queries
      .select(col(queryIdCol).as("query_id"), explode(tokens(col(textCol))).as("__tok"))
      .distinct()
    val sizes = cTok.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val qSizes = qTok.groupBy(col("query_id")).agg(count(lit(1)).as("__qn"))
    val inter = cTok
      .join(broadcast(qTok), Seq("__tok"))
      .filter(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("__i"))
    val scored = inter
      .join(sizes, Seq(idCol))
      .join(broadcast(qSizes), Seq("query_id"))
      // exact rational in a double on both engines: ranked raw, rounded
      // only for display
      .select(col("query_id"), col(idCol),
        (col("__i") / (col("__n") + col("__qn") - col("__i"))).as("__j"))
    // bounded-heap top-k: each map partition reduces to <= k candidates
    // per query before the exchange (the same sweep tfidf/bm25/inverted
    // index got — no Window, no per-query sort of the candidate frame)
    graft.dp.TopK
      .topKPerKeyDirectional(
        scored, Seq("query_id"), Seq("__j" -> false, idCol -> true), k)
      .select(col("query_id"), col(idCol),
        round(col("__j"), 6).as("jaccard"), col("rank"))
  }

  /** Full stats table over a documents frame. */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    df.select(
      col(idCol),
      tokenCount(c).as("n_tokens"),
      regexTokenCount(c).as("n_regex_tokens"),
      length(c).as("n_chars"),
      round(punctRatio(c), 6).as("punct_ratio"),
      round(digitRatio(c), 6).as("digit_ratio"),
      round(upperRatio(c), 6).as("upper_ratio"),
      round(qualityScore(c), 6).as("quality"))
  }

  /** DEFLATE compression ratio quality signal (compressed bytes / raw
    * bytes, null for empty text) — see [[graft.expressions.DeflateRatio]]:
    * the published Gopher/RefinedWeb boilerplate-and-junk filter hangs
    * off both tails of this one number. */
  def deflateRatio(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.DeflateRatio(
        org.apache.spark.sql.graft.Bridge.expression(c.cast("string"))))

  /** HTML → document text (see [[graft.expressions.HtmlText]]): the raw
    * crawl → text first stage; block tags become newlines so the
    * line-level dedup/quality operators see paragraph structure. */
  def htmlToText(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.HtmlText(
        org.apache.spark.sql.graft.Bridge.expression(c.cast("string"))))

  /** Document title from raw HTML: the first `<title>` element's text,
    * entity-decoded and whitespace-normalized by routing the fragment
    * through [[htmlToText]]. Null-safe: pages without a title yield ""
    * (regexp_extract's no-match convention). The crawl-metadata
    * companion to the body extraction — titles feed dedup keys, quality
    * features, and search indexes. */
  def htmlTitle(c: Column): Column =
    // titles are one line by definition: collapse ANY whitespace run
    // (including the newlines htmlToText deliberately preserves for
    // body text) to a single space
    trim(regexp_replace(
      htmlToText(regexp_extract(c, "(?is)<title[^>]*>(.*?)</title>", 1)),
      "\\s+", " "))

  /** Declared document language from raw HTML: the `<html lang=...>`
    * attribute, lowercased ("" when absent) — the prior a crawl pipeline
    * checks the n-gram language ID against (disagreement is itself a
    * quality signal). */
  def htmlDeclaredLang(c: Column): Column =
    lower(regexp_extract(c,
      "(?is)<html[^>]*?\\slang\\s*=\\s*[\"']?([A-Za-z][A-Za-z0-9-]*)", 1))

  /** Per-line content-vs-chrome classification over extracted text — the
    * jusText/trafilatura heuristic core, simplified to a deterministic
    * rule: a line is boilerplate when it is SHORT (fewer than `minTokens`
    * tokens — nav menus, button labels, copyright lines) or carries
    * almost no stopword mass (`stop_ratio < minStopRatio` — keyword
    * lists, breadcrumbs; full sentences in any supported language clear
    * it, and Han-bearing lines are exempt since CJK has no stopword
    * signal here). Works on the newline structure [[htmlToText]]
    * preserves. Output: (idCol, line_no, line, n_tokens, stop_hits,
    * is_boilerplate). One posexplode, no shuffle beyond it. */
  def boilerplateLineStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 4,
      minStopRatio: Double = 0.15): DataFrame = {
    val allStop = langStopwords.values.flatten.toSeq.distinct.sorted
    df.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("n_tokens", tokenCount(col("line")))
      .withColumn("stop_hits",
        element_at(tokenSetCounts(col("line"), Seq(allStop)), 1))
      .withColumn("is_boilerplate",
        col("n_tokens") < minTokens ||
          (col("stop_hits").cast("double") / col("n_tokens") < minStopRatio &&
            hanCount(col("line")) === 0))
  }

  /** Rebuild each document from its content lines only (the enforcement
    * half of [[boilerplateLineStats]]): chrome lines drop, surviving
    * lines rejoin in order; a document of pure chrome keeps an empty
    * text (filter it downstream with the length gates). One explode +
    * one per-doc groupBy — keyed shuffles only. */
  def removeBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 4,
      minStopRatio: Double = 0.15): DataFrame = {
    val kept = boilerplateLineStats(df, idCol, textCol, minTokens, minStopRatio)
      .filter(!col("is_boilerplate"))
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(
          sort_array(collect_list(struct(col("line_no"), col("line")))),
          s => s.getField("line"))).as("__clean"))
    df.join(kept, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__clean"), lit("")))
      .drop("__clean")
  }

  /** Per-document Shannon entropy (nats) at the character and word
    * level — the repetition/boilerplate signals the ratio heuristics
    * miss: low char entropy = repeated characters/markup, low word
    * entropy = template text repeating a small vocabulary. Output:
    * (idCol, n_chars, char_entropy, n_words, word_entropy).
    *
    * Entropy is computed as `ln(n) − (Σ c·ln c)/n` over per-element
    * counts — one explode + two keyed groupBys per level, partitioned by
    * document id throughout (no global state, scale shape is keyed
    * shuffles only). Documents with empty text have no characters:
    * char_entropy is null there, word entropy 0 (the tokenizer's empty
    * split yields one empty token — consistent with the LM queries). */
  def entropyStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def entropyOf(elems: DataFrame, nCol: String, eCol: String): DataFrame =
      elems.groupBy(col(idCol), col("__e")).agg(count(lit(1)).as("__c"))
        .groupBy(col(idCol))
        .agg(
          sum(col("__c")).as(nCol),
          (log(sum(col("__c"))) -
            sum(col("__c") * log(col("__c"))) / sum(col("__c"))).as(eCol))
    // sequence(1, 0) in Spark steps DOWNWARD ([1, 0]) instead of being
    // empty — guard empty text explicitly or it grows two phantom chars
    val tc = graft.Exprs.bt(textCol)
    val chars = df
      .select(col(idCol),
        explode(when(length(col(textCol)) > 0,
          expr(s"transform(sequence(1, length($tc)), i -> substring($tc, i, 1))"))
          .otherwise(expr("array()").cast("array<string>"))).as("__e"))
    val words = df
      .select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__e"))
    df.select(col(idCol))
      .join(entropyOf(chars, "n_chars", "char_entropy"), Seq(idCol), "left")
      .join(entropyOf(words, "n_words", "word_entropy"), Seq(idCol), "left")
  }
}
