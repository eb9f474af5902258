package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling and train/test splitting
  * (reference: src/ta_lib/pyspark/dp.py:845-995).
  *
  * All methods are seed-deterministic Bernoulli/randomSplit compositions;
  * the only driver collection is the stratified split's CAPPED class list.
  * The reference's
  * stratified split divides the test share per class (test_prop/2,
  * dp.py:985-990, a bug); we implement correct per-class proportions
  * (documented in DIVERGENCES.md).
  */
object Sampling {


  /** Per-stratum Bernoulli sampling (e.g. downsample a corpus by language
    * or source with different keep rates). Wraps `df.stat.sampleBy`: one
    * pass, seeded, no shuffle — strata absent from `fractions` are
    * dropped. */
  def stratifiedSample[T](
      df: DataFrame,
      stratumCol: String,
      fractions: Map[T, Double],
      seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Plain Bernoulli sample (reference: dp.py:885-915). */
  def sample(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Rule-based class rebalance: cap responders at maxSampleSize and match
    * non-responders 1:1 (reference: dp.py:845-917 `sampling`). */
  def rebalance(df: DataFrame, target: String, maxSampleSize: Long, seed: Long): DataFrame = {
    val pos = df.filter(col(target) === 1)
    val neg = df.filter(col(target) === 0)
    val nPos = pos.count()
    val nNeg = neg.count()
    val wantPos = math.min(nPos, maxSampleSize)
    val posS = if (nPos > wantPos) pos.sample(withReplacement = false, wantPos.toDouble / nPos, seed) else pos
    val negS = if (nNeg > wantPos) neg.sample(withReplacement = false, wantPos.toDouble / nNeg, seed) else neg
    posS.unionByName(negS)
  }

  /** Exact-count class rebalance: every class is downsampled to the SAME
    * size — min(maxSampleSize, smallest class) — by keeping the rows with
    * the largest md5(id:salt) priorities per class. The deterministic
    * companion to [[rebalance]]: Bernoulli gives approximate counts that
    * drift run-to-run and engine-to-engine, while the md5 draw is a pure
    * function of the data, so the exact sample reproduces anywhere
    * (including the DuckDB oracle) and train sets are auditable.
    *
    * Scale shape: one groupBy for the class sizes (bounded driver state —
    * capped at 100 classes like [[stratifiedSplit]]), then the per-class
    * reservoir through the bounded-heap top-k aggregate: each map
    * partition reduces to ≤ k rows per class before the exchange. */
  def rebalanceExact(
      df: DataFrame,
      target: String,
      maxSampleSize: Long,
      idCol: String,
      salt: String): DataFrame = {
    val sizes = df.groupBy(col(target)).agg(count(lit(1)).as("n"))
      .limit(101).collect()
    require(sizes.length <= 100,
      s"rebalanceExact($target): more than 100 distinct classes — " +
        "rebalance on a categorical label, not a continuous column")
    require(sizes.nonEmpty, s"rebalanceExact($target): empty input")
    val k = math.min(maxSampleSize, sizes.map(_.getLong(1)).min)
    reservoirPerKey(df, Seq(target), idCol, k.toInt, salt)
  }

  /** Random train/test split (reference: dp.py:974-978). */
  def trainTestSplit(df: DataFrame, testProp: Double, seed: Long): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(1 - testProp, testProp), seed)
    (train, test)
  }

  /** Leakage-free temporal split: the cutoff is the `trainFraction`
    * quantile of the numeric event-time column; train = rows at/before
    * the cutoff, test = strictly after. The right split for any
    * time-ordered prediction task — a random split leaks future rows into
    * training. One percentile aggregate learns the cutoff (approx sketch
    * by default like every percentile estimator); both sides are plain
    * pushdown-friendly filters over the original frame. */
  def temporalSplit(
      df: DataFrame,
      tsCol: String,
      trainFraction: Double,
      exact: Boolean = false): (DataFrame, DataFrame) = {
    require(trainFraction > 0 && trainFraction < 1, s"trainFraction in (0,1), got $trainFraction")
    val row = df.agg(graft.Exprs.pct(col(tsCol).cast("double"), trainFraction, exact)).head()
    require(!row.isNullAt(0),
      s"temporalSplit($tsCol): no non-null timestamps to learn a cutoff from")
    val cut = row.getDouble(0)
    // rows with a null timestamp would silently fail BOTH filters and
    // vanish from the dataset — exclude them explicitly so the contract
    // (train ∪ test = non-null-ts rows) is visible at the call site
    val valid = df.filter(col(tsCol).isNotNull)
    (valid.filter(col(tsCol).cast("double") <= cut), valid.filter(col(tsCol).cast("double") > cut))
  }

  /** Deterministic negative sampling for contrastive training pairs: for
    * every row, `m` pseudo-random partner ids from the dense id space
    * [0, idSpace) via the portable md5(id:j) draw — a 52-bit uniform
    * value mod idSpace, so negatives cover the FULL id space (an earlier
    * linear-congruential form never exceeded ~3.1M, silently confining
    * every negative to the low ids on large spaces) and the pairing is
    * reproducible across engines, runs, and partitionings (unlike
    * rand(), whose draw depends on partition layout). Self-pairs are
    * dropped, so a row yields m or m-1 negatives.
    *
    * Scale shape: projection + explode only — negatives are generated
    * where the positives already live, no join against the corpus, no
    * shuffle. Modulo bias is negligible for idSpace << 2^52; true
    * hard-negative mining composes downstream via similarity joins. */
  def negativePairs(df: DataFrame, idCol: String, m: Int, idSpace: Long): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(idSpace > 1, s"idSpace must be > 1, got $idSpace")
    df.select(col(idCol).cast("long").as("id"))
      .select(col("id"), explode(sequence(lit(1L), lit(m.toLong))).as("j"))
      .withColumn("neg_id",
        graft.Exprs.md5Bits52(concat_ws(":", col("id"), col("j"))) % idSpace)
      .filter(col("neg_id") =!= col("id"))
  }

  /** Deterministic engine-portable stratified split: each row draws a
    * uniform u from md5(class:id:salt) — the same 52-bit portable draw as
    * [[weightedSample]] — and lands in 'test' iff u < testProp. Per-class
    * proportions concentrate at testProp exactly like the reference's
    * per-class Bernoulli randomSplit (dp.py:979-994), but the assignment
    * is a pure function of the data: the identical rows split the
    * identical way in any engine (auditable in the DuckDB oracle row for
    * row), re-runs are stable, and adding rows never reshuffles existing
    * assignments — the property an incremental training pipeline needs.
    * Including the class in the hash decorrelates draws across classes.
    *
    * Scale shape: a pure scan — no shuffle, no window, no per-class
    * state; the deterministic companion to [[stratifiedSplit]]. */
  def stratifiedSplitHash(
      df: DataFrame,
      target: String,
      testProp: Double,
      idCol: String,
      salt: String): DataFrame = {
    require(testProp > 0 && testProp < 1, s"testProp must be in (0,1), got $testProp")
    val u = (graft.Exprs.md5Bits52(concat_ws(":",
      col(target).cast("string"), col(idCol).cast("string"), lit(salt)))
      .cast("double") + 0.5) / lit((1L << 52).toDouble)
    df.withColumn("split", when(u < testProp, "test").otherwise("train"))
  }

  /** Stratified split: per-class randomSplit, reassembled with unionByName
    * (reference: dp.py:979-994, with the test_prop/2 bug fixed). The class
    * collect is CAPPED like the encoder fits — pointing this at a
    * continuous column would otherwise collect every distinct value to the
    * driver and fan out one scan per value. */
  def stratifiedSplit(
      df: DataFrame,
      target: String,
      testProp: Double,
      seed: Long,
      maxClasses: Int = 100): (DataFrame, DataFrame) = {
    val classes = df.select(col(target)).distinct().limit(maxClasses + 1).collect().map(_.get(0))
    require(
      classes.length <= maxClasses,
      s"stratifiedSplit($target): more than $maxClasses distinct classes — " +
        "stratify on a categorical label, not a continuous column")
    val splits = classes.map { cls =>
      val Array(tr, te) =
        df.filter(col(target) <=> lit(cls)).randomSplit(Array(1 - testProp, testProp), seed)
      (tr, te)
    }
    (splits.map(_._1).reduce(_ unionByName _), splits.map(_._2).reduce(_ unionByName _))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES): each row draws a uniform u from a seeded md5 of its
    * content and wins with priority -ln(u)/w — the k smallest priorities
    * are an exact without-replacement sample where inclusion odds scale
    * with the weight column (quality scores, importance weights). Rows
    * with weight <= 0 are excluded.
    *
    * The draw is md5 (like [[reservoirPerKey]]), not xxhash64: md5 exists
    * in every engine, so the exact sample reproduces in DuckDB/Trino/
    * Snowflake — auditable sampling, not just repeatable-in-Spark. The
    * first 13 hex chars give 52 uniform bits, exactly representable in a
    * double. `hashCols` selects what identifies a row (pass the id
    * column); default is every column. Hash inputs are joined with ':'
    * after string-cast and NULL columns are skipped by concat_ws — prefer
    * explicit non-null id cols.
    *
    * Scale shape: the selection runs through the native bounded-heap top-k
    * aggregate, so every map partition reduces to <= k candidate rows
    * BEFORE the exchange — shuffle volume is the answer size, not the
    * corpus. With `stratumCols` the sample is per-stratum (k each), the
    * weighted companion to [[stratifiedSample]]. Deterministic for a fixed
    * seed and content: byte-identical rows draw identical u (duplicates
    * rise and fall together — dedup first if that matters).
    */
  def weightedSample(
      df: DataFrame,
      weightCol: String,
      k: Int,
      seed: Long,
      stratumCols: Seq[String] = Nil,
      hashCols: Seq[String] = Nil): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val M = 1L << 52
    val hashSrc = if (hashCols.nonEmpty) hashCols else df.columns.toSeq
    val hashed = concat_ws(":", (hashSrc.map(c => col(c).cast("string")) :+
      lit(seed.toString)): _*)
    val u = (graft.Exprs.md5Bits52(hashed).cast("double") + 0.5) / lit(M.toDouble)
    val priority = -log(u) / col(weightCol)
    val keys = if (stratumCols.nonEmpty) stratumCols else Seq("__g")
    val keyed = (if (stratumCols.nonEmpty) df else df.withColumn("__g", lit(1)))
      .filter(col(weightCol) > 0)
      .withColumn("__prio", priority)
    graft.dp.TopK
      .topKPerKeyExpr(keyed, keys, Seq(-col("__prio")), k)
      .drop("__prio")
      .drop((if (stratumCols.isEmpty) Seq("__g") else Nil): _*)
  }

  /** Corpus mix planning: given a target share per stratum (language,
    * source, quality bucket, …) and a total document budget, compute the
    * per-stratum Bernoulli sampling rate that hits the target — the step
    * before `stratifiedSample` when curating a training mix from a skewed
    * crawl. Strata absent from `targetShares` get share 0 (rate 0);
    * strata with fewer documents than their target are flagged `deficit`
    * (rate capped at 1.0 — planner output tells you which languages you
    * must go crawl more of, instead of silently under-delivering the mix).
    *
    * One groupBy over the corpus + a literal when-chain for the shares —
    * no driver collect, no join; plan output is |strata| rows. Execute the
    * plan with `stratifiedSample(df, stratumCol, rates)`.
    */
  def corpusMixPlan(
      df: DataFrame,
      stratumCol: String,
      targetShares: Map[String, Double],
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    val badShares = targetShares.filter { case (_, v) => v < 0 || v > 1 }
    require(badShares.isEmpty, s"target shares must be in [0,1], got $badShares")
    // full-outer against the declared shares: a target stratum with ZERO
    // corpus rows must still emit its (available=0, deficit=true) row —
    // that fully-missing case is exactly what the plan exists to surface,
    // and a groupBy over the corpus alone can never produce it
    val spark = df.sparkSession
    val sharesDf = spark.createDataFrame(targetShares.toSeq)
      .toDF(stratumCol, "__share")
    val share = coalesce(col("__share"), lit(0.0))
    df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("available"))
      .join(sharesDf, Seq(stratumCol), "full_outer")
      .select(
        col(stratumCol),
        coalesce(col("available"), lit(0L)).as("available"),
        floor(lit(budget) * share).cast("bigint").as("target_n"),
        round(
          when(coalesce(col("available"), lit(0L)) > 0,
            least(lit(1.0), lit(budget) * share / col("available")))
            .when(share > 0, 1.0)
            .otherwise(0.0), 6).as("rate"),
        (coalesce(col("available"), lit(0L)) < lit(budget) * share).as("deficit"))
  }

  /** Temperature-scaled corpus mix (the multilingual-pretraining
    * rebalance): stratum sampling weights ∝ (stratum share)^alpha,
    * renormalized. alpha = 1 keeps the natural distribution, alpha = 0 is
    * uniform over strata, and the usual 0.2–0.7 range up-samples the tail
    * (low-resource languages) without letting the head dominate. Unlike
    * [[corpusMixPlan]] (explicit target shares) the targets here are
    * DERIVED from the corpus itself — no hand-written share table.
    *
    * Same plan shape as corpusMixPlan plus a 1-row broadcast for the
    * weight normalizer: one groupBy over the corpus, |strata| rows out,
    * no driver collect. Execute with `stratifiedSample(df, stratumCol,
    * rates)`. */
  def temperatureMixPlan(
      df: DataFrame,
      stratumCol: String,
      alpha: Double,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("available"))
    val w = pow(col("available").cast("double"), lit(alpha))
    val norm = counts.agg(sum(pow(col("available").cast("double"), lit(alpha))).as("__wsum"))
    counts
      .crossJoin(broadcast(norm))
      .select(
        col(stratumCol),
        col("available"),
        floor(lit(budget) * w / col("__wsum")).cast("bigint").as("target_n"),
        round(least(lit(1.0), lit(budget) * w / col("__wsum") / col("available")), 6).as("rate"),
        (col("available") < lit(budget) * w / col("__wsum")).as("deficit"))
  }

  /** UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): distribute a token budget UNIFORMLY
    * across strata, except that no stratum may repeat more than
    * `epochCap` epochs of its own corpus — the classic water-filling
    * allocation. Capped strata (corpus · epochCap below the fair share)
    * take their cap; the leftover redistributes uniformly among the
    * rest, i.e. `budget_tokens = min(cap_tokens, λ*)` where λ* is the
    * water level with `Σ min(cap, λ*) = budget`. Unlike
    * [[temperatureMixPlan]] there is no tuning exponent — the paper's
    * point is that the epoch cap alone prevents low-resource
    * over-repetition while staying maximally uniform.
    *
    * Output per stratum: `corpus_tokens`, `cap_tokens`,
    * `budget_tokens`, `rate` (budget/corpus, CAN exceed 1 — up-sampling
    * means multiple epochs), `capped`. If the budget exceeds every
    * cap's sum, all strata cap and the plan under-fills (visible as
    * `Σ budget_tokens < budget` — the paper's regime always has a head
    * language to absorb the remainder, but the plan must not invent
    * tokens).
    *
    * Scale shape: one groupBy over the corpus to |strata| rows, then
    * the water level is computed INSIDE one further single-row
    * aggregate — the sorted (cap asc, stratum) array is bounded by
    * stratum cardinality (languages: hundreds), and a single
    * left-to-right pass finds λ* = (budget − Σ capped caps)/(remaining)
    * at the first uncapped stratum. No window, no driver collect; the
    * 1-row level frame broadcasts back. The sequential pass also fixes
    * the float addition ORDER, which is what lets an external engine
    * replay λ* bit for bit. */
  def unimaxPlan(
      df: DataFrame,
      stratumCol: String,
      nTokensCol: String,
      budget: Long,
      epochCap: Double): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(epochCap > 0, s"epochCap must be > 0, got $epochCap")
    val counts = df
      .groupBy(col(stratumCol))
      .agg(sum(col(nTokensCol)).cast("long").as("corpus_tokens"))
      .withColumn("cap_tokens",
        col("corpus_tokens").cast("double") * lit(epochCap))
    val level = counts
      .agg(
        count(lit(1)).cast("int").as("__L"),
        sort_array(collect_list(struct(
          col("cap_tokens").as("cap"), col(stratumCol).as("s")))).as("__xs"))
      .select(expr(
        s"""aggregate(__xs,
           |  named_struct('i', 0, 'cum', cast(0.0 as double),
           |               'lam', cast(null as double)),
           |  (a, x) -> named_struct(
           |    'i', a.i + 1,
           |    'cum', a.cum + x.cap,
           |    'lam', CASE WHEN a.lam IS NULL
           |                     AND x.cap >= (${budget}d - a.cum) / (__L - a.i)
           |                THEN (${budget}d - a.cum) / (__L - a.i)
           |                ELSE a.lam END),
           |  a -> a.lam)""".stripMargin).as("__lam"))
    counts
      .crossJoin(broadcast(level))
      .select(
        col(stratumCol),
        col("corpus_tokens"),
        col("cap_tokens"),
        round(when(col("__lam").isNull, col("cap_tokens"))
          .otherwise(least(col("cap_tokens"), col("__lam"))), 6)
          .as("budget_tokens"),
        round(
          when(col("__lam").isNull, col("cap_tokens"))
            .otherwise(least(col("cap_tokens"), col("__lam")))
            / col("corpus_tokens"), 6).as("rate"),
        (col("__lam").isNull || col("cap_tokens") < col("__lam")).as("capped"))
  }

  /** Execute a [[unimaxPlan]]: each document repeats `floor(rate)` full
    * epochs and joins one more with probability `rate − floor(rate)` —
    * a portable md5 draw per document, so expected tokens per stratum
    * equal the plan's budget and the sample is deterministic and
    * replayable. Output rows carry `epoch` (0-based). A stratum at
    * rate ≤ 1 degenerates to plain Bernoulli sampling; the up-sampled
    * tail gets whole-corpus epochs, which preserves within-stratum
    * uniformity exactly (UniMax's fairness property — no document of a
    * language repeats more than one epoch ahead of its peers).
    *
    * Scale shape: broadcast plan join + a bounded explode
    * (≤ ⌈epochCap⌉ + 1 per row) + a pure filter — no shuffle of the
    * corpus. */
  def unimaxSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      nTokensCol: String,
      budget: Long,
      epochCap: Double,
      seed: Long): DataFrame = {
    val plan = unimaxPlan(df, stratumCol, nTokensCol, budget, epochCap)
      .select(col(stratumCol), col("rate"))
    val u = (graft.Exprs.md5Bits52(concat_ws(":",
      lit("umx"), lit(seed.toString), col(idCol).cast("string")))
      + lit(0.5)) / lit(4503599627370496.0)
    df.join(broadcast(plan), Seq(stratumCol))
      .withColumn("__full", floor(col("rate")).cast("int"))
      .withColumn("epoch",
        explode(sequence(lit(0), col("__full"))))
      .filter(col("epoch") < col("__full") ||
        u < col("rate") - col("__full"))
      .drop("rate", "__full")
  }

  /** Deterministic uniform reservoir of exactly `k` rows per stratum
    * (min(k, stratum size) for small strata): every row gets an md5
    * priority from (id, salt) and the k largest priorities per key win.
    * Unlike `stratifiedSample` (Bernoulli — approximate counts) this is
    * EXACT-k, and unlike `randomSplit` it is stable under repartitioning
    * and engine changes: md5 is a portable function of the data itself,
    * so any engine (and the DuckDB oracle) reproduces the same sample.
    *
    * Scale shape: the priorities flow through the bounded-heap top-k
    * aggregate — each map partition reduces to ≤ k rows per stratum
    * before the exchange, so the shuffle carries ~|strata|·k rows no
    * matter how large the corpus. No window, no global sort. */
  def reservoirPerKey(
      df: DataFrame,
      stratumCols: Seq[String],
      idCol: String,
      k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.dp.TopK
      .topKPerKeyExpr(
        df.withColumn("__prio", md5(concat(col(idCol).cast("string"), lit(salt)))),
        stratumCols,
        Seq(col("__prio")),
        k)
      .drop("__prio")
  }

  /** Cluster-safe train/test split: near-duplicate documents must never
    * straddle the split boundary — a test doc whose near-twin sits in
    * train is eval contamination that document-level hash splits cannot
    * prevent. Every member of a near-dup cluster draws its split from the
    * CLUSTER's label (the smallest member id, as produced by
    * [[graft.dedup.Dedup.nearDupClusters]]); rows absent from `clusters`
    * are singletons drawing from their own id. The draw is the same
    * portable 52-bit md5 uniform as [[stratifiedSplitHash]] — a pure
    * function of the data, reproduced row for row by the DuckDB oracle,
    * stable under appends (new docs never reshuffle existing splits
    * unless they join a cluster, which is exactly the semantics wanted:
    * a new near-dup of a train doc must land in train).
    *
    * Scale shape: one equi-join against the cluster-label frame (tiny
    * relative to the corpus — only clustered docs appear; broadcast when
    * small) plus a pure-scan hash projection. No window, no global
    * state. */
  def clusterSafeSplit(
      df: DataFrame,
      idCol: String,
      clusters: DataFrame,
      testProp: Double,
      salt: String): DataFrame = {
    require(testProp > 0 && testProp < 1, s"testProp must be in (0,1), got $testProp")
    // internal label name: never collides with a caller column. The min
    // aggregate makes the label frame canonical — an id accidentally
    // listed under two labels (which proper connected components never
    // produce, since such clusters would have merged) takes the smallest,
    // instead of the left join silently DUPLICATING that document's rows
    val lbl = clusters.groupBy(col("id").as(idCol))
      .agg(min(col("cluster_id")).as("__graft_cl"))
    val u = (graft.Exprs.md5Bits52(concat_ws(":",
      coalesce(col("__graft_cl"), col(idCol)).cast("string"), lit(salt)))
      .cast("double") + 0.5) / lit((1L << 52).toDouble)
    df.join(lbl, Seq(idCol), "left")
      .withColumn("split", when(u < testProp, "test").otherwise("train"))
      .drop("__graft_cl")
  }
}
