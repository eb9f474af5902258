package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR) — pick raw-corpus
  * documents whose hashed n-gram distribution looks like a target corpus
  * (e.g. "select web pages that read like the curated reference set").
  * Public technique: Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"; no reference-repo counterpart
  * (the reference has no corpus-curation surface at all).
  *
  * Shape: featurize each document as counts over `buckets` hashed
  * unigram+bigram buckets; fit smoothed bucket distributions p (target)
  * and q (raw); weight each raw document by its log-likelihood ratio
  * `log w(x) = Σ_b c_b(x) · (ln p_b − ln q_b)`; resample without
  * replacement with probability ∝ w via the Gumbel-top-k trick.
  *
  * Scale shape: one explode + one (doc, bucket) groupBy per corpus —
  * keyed shuffles only; both distributions are exactly `buckets` rows
  * (driver-free, broadcast into the weight join); selection runs through
  * TakeOrderedAndProject (per-partition top-k before the exchange), so
  * shuffle volume is the answer size, not the corpus. Nothing here
  * depends on corpus row count beyond the linear featurize pass.
  *
  * Every draw and hash is md5-based (like [[Sampling.weightedSample]]),
  * so weights AND the selected set reproduce bit-for-bit in any engine
  * with md5/ln — the oracle replays the whole pipeline in DuckDB.
  */
object Dsir {

  /** Hashed n-gram featurization: counts over `buckets` buckets of the
    * lowercased whitespace unigrams and bigrams (bigram key is
    * "w1 w2"). Output: (idCol, bucket, cnt) — the sparse per-document
    * feature vector. Tokenization matches the LM queries
    * (`split(trim(lower(text)), "\\s+")`) so corpora featurize
    * identically across the curation surface. */
  def hashedNgramCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // the [[graft.expressions.NgramSlots]] kernel folds gram construction
    // and md5-bucketing into one per-document pass — the Catalyst
    // transform-lambda + concat route is CodegenFallback and cost 5.5 s
    // of a 7.4 s featurize at 5000 docs; values are identical
    val slots = org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.NgramSlots(
        org.apache.spark.sql.graft.Bridge.expression(
          split(trim(lower(col(textCol))), "\\s+")),
        buckets))
    docs
      .select(col(idCol), explode(slots).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Laplace-smoothed bucket log-probabilities over a featurized corpus:
    * exactly `buckets` rows (unseen buckets get the smoothing floor), so
    * the distribution is a fixed-size broadcastable table no matter the
    * corpus size. `ln((c_b + alpha) / (total + alpha · buckets))`. */
  def bucketLogProbs(
      docCounts: DataFrame,
      buckets: Int,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val spark = docCounts.sparkSession
    val byBucket = docCounts.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("__c"))
    // grand total from the buckets-sized rollup, not a second pass over
    // the featurized corpus: Σ_b (Σ cnt)_b ≡ Σ cnt exactly (long
    // arithmetic), and the byBucket subtree is shared with the join
    // above, so the featurize exchange is computed once and reused
    val total = byBucket.agg(coalesce(sum(col("__c")), lit(0L)).as("__n"))
    spark.range(buckets).select(col("id").as("bucket"))
      .join(byBucket, Seq("bucket"), "left")
      .crossJoin(broadcast(total))
      .select(col("bucket"),
        log((coalesce(col("__c"), lit(0L)) + lit(alpha)) /
          (col("__n") + lit(alpha * buckets))).as("logp"))
  }

  /** Per-document importance log-weight of `docCounts` under
    * target-vs-raw distributions: `Σ_b c_b · (lp_target − lp_raw)`.
    * Both distribution tables are `buckets` rows — broadcast joins, no
    * big-side shuffle beyond the per-doc sum. Documents with no grams
    * (impossible with the split tokenizer: even "" yields one token)
    * would simply be absent. */
  def importanceLogWeights(
      docCounts: DataFrame,
      targetLogProbs: DataFrame,
      rawLogProbs: DataFrame,
      idCol: String): DataFrame =
    docCounts
      .join(broadcast(targetLogProbs.select(col("bucket"), col("logp").as("__lt"))),
        Seq("bucket"))
      .join(broadcast(rawLogProbs.select(col("bucket"), col("logp").as("__lr"))),
        Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * (col("__lt") - col("__lr"))).as("log_weight"))

  /** End-to-end weights: featurize both corpora, fit both distributions,
    * weight every raw document. */
  def logWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 8192,
      alpha: Double = 1.0): DataFrame = {
    val rawCounts = hashedNgramCounts(raw, idCol, textCol, buckets)
    val tgtCounts = hashedNgramCounts(target, idCol, textCol, buckets)
    importanceLogWeights(rawCounts,
      bucketLogProbs(tgtCounts, buckets, alpha),
      bucketLogProbs(rawCounts, buckets, alpha), idCol)
  }

  /** Gumbel-top-k resampling: draw u ~ U(0,1) from a seeded md5 of the
    * id, give each document priority `log_weight − ln(−ln u)`, keep the
    * k largest — an exact without-replacement sample where inclusion
    * odds scale with exp(log_weight) (the Gumbel-max trick; the
    * softmax-sampling twin of [[Sampling.weightedSample]]'s A-ES, which
    * needs positive linear weights rather than log-space ones).
    * Deterministic for a fixed seed; reproduces in any md5+ln engine. */
  def gumbelTopK(
      weighted: DataFrame,
      idCol: String,
      logWeightCol: String,
      k: Int,
      seed: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val M = (1L << 52).toDouble
    val u = (graft.Exprs.md5Bits52(concat_ws(":",
      lit(seed.toString), col(idCol).cast("string")))
      .cast("double") + lit(0.5)) / lit(M)
    weighted
      .withColumn("priority", col(logWeightCol) - log(-log(u)))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }
}
