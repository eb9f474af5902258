package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact content-hash
  * dedup, MinHash-LSH banded near-dup, SimHash, and n-gram Jaccard.
  *
  * Scale design:
  *   - exact dedup is one hash-partitioned groupBy on the content hash —
  *     never compares texts pairwise;
  *   - MinHash-LSH generates candidate pairs ONLY inside (band, signature)
  *     buckets (a self-join per bucket), never all-pairs; bucket sizes are
  *     capped so a degenerate signature can't quadratically explode;
  *   - SimHash is a pure expression (64-bit signature per doc);
  *   - n-gram Jaccard is explode + join-on-shingle + pair-count —
  *     shuffle-bound, no cartesian.
  */
object Dedup {

  /** Normalized content view used for exact dedup. */
  def normalized(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** sha2-256 of the normalized text. */
  def contentHash(c: Column): Column = sha2(normalized(c), 256)

  /** Exact dedup: keep the smallest id per normalized-content hash.
    * One groupBy on the hash — fully distributed, no pairwise compare. */
  def exactDedupKeys(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(contentHash(col(textCol)).as("__h"), col(idCol))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Exact dedup returning the surviving rows (first = smallest id). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(exactDedupKeys(df, idCol, textCol), Seq(idCol), "left_semi")

  /** Incremental exact dedup — the steady-state shape of corpus curation:
    * a new `batch` arrives against an already-deduped `corpus`, and only
    * batch documents whose normalized content is BOTH new to the corpus and
    * unique within the batch survive (smallest id wins inside the batch).
    *
    * Scale: the corpus side collapses to a distinct hash projection (one
    * column scanned off disk — at 100 TB the corpus is read as hashes, not
    * text; better still, persist the hash column at write time and the scan
    * prunes to it), then one left_anti hash join. No pairwise compares. */
  def incrementalExactDedupKeys(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val batchKeys = batch
      .select(contentHash(col(textCol)).as("__h"), col(idCol))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as(idCol))
    val corpusHashes = corpus.select(contentHash(col(textCol)).as("__h")).distinct()
    batchKeys.join(corpusHashes, Seq("__h"), "left_anti").select(idCol)
  }

  /** As [[incrementalExactDedupKeys]] but returning the surviving rows. */
  def incrementalExactDedup(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    batch.join(incrementalExactDedupKeys(batch, corpus, idCol, textCol), Seq(idCol), "left_semi")

  /** Distinct word k-shingles of a text column, as STRINGS. Interpreted
    * lambda + string allocation per gram — use only where the gram text
    * itself is needed; operators that only need gram IDENTITY (joins,
    * Jaccard, overlap counts) use [[hashedShingles]], which does the same
    * tokenize/window walk in one native loop emitting longs. */
  def shingles(c: Column, k: Int): Column = {
    val toks = split(lower(trim(c)), "\\s+")
    val n = size(toks)
    array_distinct(
      transform(
        sequence(lit(0), greatest(n - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
  }

  /** Distinct word k-shingles as 64-bit hashes (native kernel,
    * graft.expressions.WordShingleHashes) — same windows as [[shingles]],
    * ~10x cheaper, identical downstream counts modulo negligible hash
    * collisions (~|grams|²/2⁶⁴). */
  def hashedShingles(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.WordShingleHashes(
        org.apache.spark.sql.graft.Bridge.expression(c), k))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over shingle hashes — one native-loop expression per row
    * (graft.expressions.ShingleMinHash; the k × array_min(transform(...))
    * formulation paid interpreted-lambda cost per shingle × hash). */
  def minhashSignature(c: Column, k: Int = 3, numHashes: Int = 32): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.ShingleMinHash(
        org.apache.spark.sql.graft.Bridge.expression(shingles(c, k)),
        numHashes))

  /** Candidate near-dup pairs via banded LSH over the MinHash signature.
    *
    * bands × rowsPerBand = numHashes. Docs sharing ANY band's sub-signature
    * become a candidate pair; pairs are generated within buckets only.
    * maxBucket caps pathological buckets (all-identical shingles) so a
    * single bucket can't go quadratic at scale.
    *
    * Defaults (16 bands × 2 rows): catch probability 1-(1-j²)^16 — ≈0.99
    * at j=0.5, ≈0.78 at j=0.3. (8×4 sounds similar but catches only ~50%
    * at j=0.55 — verified the hard way in DedupSimilaritySpec.)
    */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      maxBucket: Int = 1000): DataFrame =
    candidatesFromShingled(
      df.select(col(idCol), shingles(col(textCol), shingleK).as("__sh")),
      idCol, bands, rowsPerBand, maxBucket)

  /** (id, band, bucket[, __sig]) rows of a pre-shingled frame, hot
    * buckets capped: the banded-LSH projection both the self-join and the
    * incremental batch-vs-corpus paths build their candidate joins on.
    *
    * `keepSig` carries the full minhash signature through the banding
    * exchange so downstream stages can SCREEN candidate pairs by
    * signature agreement without another corpus pass or a join against
    * the (quadratically larger) candidate set — the banding shuffle grows
    * by 8·numHashes bytes/row (linear in corpus), which buys killing the
    * false-positive candidates at first contact (quadratic in corpus).
    * At 500k docs the unscreened verify load was 97x the sf1 load for
    * 10x the data — the classic LSH trap of a low (1/bands)^(1/rows)
    * operating point meeting a much higher verify threshold. */
  private[dedup] def bandedBuckets(
      shingled: DataFrame,
      idCol: String,
      bands: Int,
      rowsPerBand: Int,
      maxBucket: Int,
      keepSig: Boolean = false): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.ShingleMinHash(
        org.apache.spark.sql.graft.Bridge.expression(col("__sh")),
        numHashes))
    val sigCols = if (keepSig) Seq(col("__sig")) else Nil
    val banded = shingled
      .select(col(idCol), sig.as("__sig"))
      .select(
        col(idCol) +: sigCols :+
          explode(array((0 until bands).map { b =>
            struct(
              lit(b).as("band"),
              xxhash64(concat_ws(",",
                slice(col("__sig"), b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
          }: _*)).as("bb"): _*)
      .select(col(idCol) +: sigCols :+ col("bb.band") :+ col("bb.bucket"): _*)
    banded
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
  }

  /** The shared candidate screen: keep a pair only when at least
    * `ceil(screen · numHashes)` of its two minhash signatures' components
    * agree (the standard signature Jaccard estimator). ONE definition for
    * the self-join, batch-vs-corpus, and persisted-index paths — the
    * screening contract must not drift between them. */
  private[dedup] def sigScreenKeep(
      sigA: Column, sigB: Column, screen: Double, numHashes: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b)) >=
      lit(math.ceil(screen * numHashes).toInt)

  private def candidatesFromShingled(
      shingled: DataFrame,
      idCol: String,
      bands: Int,
      rowsPerBand: Int,
      maxBucket: Int,
      numHashes: Int = 0,
      screen: Double = 0.0): DataFrame = {
    val keepSig = screen > 0.0
    val capped = bandedBuckets(shingled, idCol, bands, rowsPerBand, maxBucket, keepSig)
    def side(s: String) = {
      val cols = Seq(col("band"), col("bucket"), col(idCol).as(s"id_$s")) ++
        (if (keepSig) Seq(col("__sig").as(s"sig_$s")) else Nil)
      capped.select(cols: _*)
    }
    val joined = side("a").join(side("b"), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
    val screened =
      if (keepSig)
        // signature-estimated Jaccard screen: kill band-collision false
        // positives BEFORE the exchange to distinct + the expensive
        // exact-shingle verify. Both branch exchanges are identical, so
        // ReuseExchange computes the banding once.
        joined.filter(sigScreenKeep(col("sig_a"), col("sig_b"), screen, numHashes))
      else joined
    screened.select(col("id_a"), col("id_b")).distinct()
  }

  /** Near-dup pairs: LSH candidates verified by true n-gram Jaccard.
    *
    * Cache lifecycle: this overload is PURE — the shingle expression
    * appears three times in the plan (signature + both sides of the
    * verification join), so Catalyst recomputes it per use: three linear
    * scans, no cached state left behind (an earlier revision persisted the
    * shingle frame here and leaked MEMORY_AND_DISK blocks for the session
    * lifetime). Callers amortizing many passes over one corpus should
    * persist a shingle frame themselves and use
    * [[minhashNearDupPairsPreShingled]], whose cache they own. */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      maxBucket: Int = 1000,
      screenMargin: Double = DefaultScreenMargin): DataFrame =
    minhashNearDupPairsPreShingled(
      df.select(col(idCol), shingles(col(textCol), shingleK).as("__sh")),
      idCol, threshold, bands, rowsPerBand, maxBucket, screenMargin)

  /** Default signature-screening margin below the verify threshold (see
    * [[minhashNearDupPairsPreShingled]]). At margin 0.25 a TRUE pair
    * sitting exactly at the verify threshold is screened out with
    * probability ~2e-4 (binomial tail of 32 signature components 0.25
    * below their mean) — far below the recall already ceded to
    * `maxBucket` truncation — while a band-collision false positive at
    * similarity 0.3 survives a 0.45 screen only ~3% of the time. */
  val DefaultScreenMargin: Double = 0.25

  /** As [[minhashNearDupPairs]] but over a pre-shingled (id, __sh) frame —
    * the caller computes (and may persist/unpersist) the shingle arrays,
    * this function never caches anything itself.
    *
    * Scale shape: candidates are SCREENED by signature-estimated Jaccard
    * (fraction of agreeing minhash components, carried through the
    * banding exchange — no extra corpus pass) at
    * `threshold - screenMargin` before the exact-shingle verify. The
    * standard (bands, rowsPerBand) operating point that guarantees
    * recall on high-similarity pairs — (1/16)^(1/2) ≈ 0.25 — sits far
    * below a 0.7 verify threshold, so band-collision candidates grow
    * ~quadratically with corpus size (measured: 208k pairs at 50k docs →
    * 20.2M at 500k); the screen kills them at first contact, so only
    * ~true pairs pay the shingle-array join and intersect. Set
    * `screenMargin <= 0` to disable screening (exact LSH∩Jaccard
    * semantics, the pre-screen behavior). */
  def minhashNearDupPairsPreShingled(
      sh: DataFrame,
      idCol: String,
      threshold: Double,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      maxBucket: Int = 1000,
      screenMargin: Double = DefaultScreenMargin): DataFrame = {
    val screen = if (screenMargin > 0) math.max(0.0, threshold - screenMargin) else 0.0
    val cands = candidatesFromShingled(sh, idCol, bands, rowsPerBand, maxBucket,
      numHashes = bands * rowsPerBand, screen = screen)
    cands
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: bit i is the sign of the sum of
    * ±1 votes from each token hash's bit i. Pure expression. */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.SimHash64Expr(
        org.apache.spark.sql.graft.Bridge.expression(split(lower(trim(c)), "\\s+"))))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with FULL recall up to `maxHamming`: the 64-bit
    * signature is cut into `maxHamming + 1` contiguous chunks, so by
    * pigeonhole any pair within Hamming distance `maxHamming` agrees on at
    * least one whole chunk — candidates are generated only inside
    * (chunk, chunk-value) buckets and verified by exact Hamming distance.
    * (An earlier revision fixed 4×16-bit chunks, which guarantees recall
    * only for distance ≤ 3 and silently missed pairs at 4..maxHamming.)
    *
    * Scale: more chunks ⇒ narrower chunk keys ⇒ bigger buckets — recall is
    * paid for in candidate volume, so degenerate buckets are capped at
    * `maxBucket` members (same windowed-count cap as the MinHash path; a
    * corpus of near-identical texts can't go quadratic). */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame =
    hammingNearDupPairs(
      df.select(col(idCol), simhash64(col(textCol)).as("__sig")),
      idCol, "__sig", maxHamming, maxBucket)

  /** The pigeonhole engine behind [[simhashNearDupPairs]], generic over
    * ANY 64-bit signature column — the same machinery pairs perceptual
    * image hashes ([[graft.multimodal.Multimodal.imageNearDupPairs]]) or
    * any other 64-bit fingerprint. Full recall up to `maxHamming` by
    * construction; candidates only inside (chunk, chunk-value) buckets,
    * buckets capped at `maxBucket`. Output: (id_a, id_b, hamming). */
  def hammingNearDupPairs(
      sigFrame: DataFrame,
      idCol: String,
      sigCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    require(
      maxHamming >= 0 && maxHamming <= 31,
      s"maxHamming must be in [0, 31], got $maxHamming — beyond ~31 the " +
        "chunk keys are too narrow to bucket a 64-bit signature usefully")
    val chunks = maxHamming + 1
    // 64 bits split as evenly as possible: the first (64 % chunks) chunks
    // are one bit wider.
    val base = 64 / chunks
    val rem = 64 % chunks
    val layout = (0 until chunks).map { i =>
      val width = if (i < rem) base + 1 else base
      val offset = i * base + math.min(i, rem)
      // JVM long shifts are mod 64: (1L << 64) - 1 would be 0, silently
      // zeroing every key at maxHamming = 0 (single 64-bit chunk)
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      (i, offset, mask)
    }
    val sigs = sigFrame.select(col(idCol), col(sigCol).cast("long").as("__sig"))
    val chunked = sigs.select(
      col(idCol),
      col("__sig"),
      explode(array(layout.map { case (i, offset, mask) =>
        struct(lit(i).as("chunk"),
          shiftright(col("__sig"), offset).bitwiseAND(mask).as("key"))
      }: _*)).as("cc"))
      .select(col(idCol), col("__sig"), col("cc.chunk"), col("cc.key"))
    val capped = chunked
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("chunk"), col("key"))))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
    val l = capped.select(col("chunk"), col("key"), col(idCol).as("id_a"), col("__sig").as("sig_a"))
    val r = capped.select(col("chunk"), col("key"), col(idCol).as("id_b"), col("__sig").as("sig_b"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      // exact-verify BEFORE the distinct: hamming is two codegen'd ops on
      // longs the join already carries, so filtering per banded-duplicate
      // row is ~free and the distinct exchange ships true pairs instead
      // of the (corpus-crowding) candidate volume
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Resolve near-dup PAIRS into clusters: connected components via
    * min-label propagation (each node repeatedly adopts the smallest label
    * among itself and its neighbors until a fixpoint). Output: (id,
    * cluster_id) where cluster_id is the smallest member id.
    *
    * Small graphs take a DRIVER fast path: when the edge list has at most
    * `driverMaxEdges` rows (and integral ids), union-find with path
    * compression solves the components exactly in one bounded collect —
    * milliseconds, no iterative jobs, none of the per-iteration scheduler
    * overhead that dominates tiny graphs (a 300-node graph costs the same
    * ~8 Spark stages per iteration as a billion-node one; at the small
    * end that overhead IS the runtime, and its JIT/GC variance made the
    * capped bench queries unstable). The default 1M-edge bound collects
    * ≤ ~16 MB — the same bounded-driver-state budget as every `limit`-
    * capped collect in this codebase. Pass `driverMaxEdges = 0` to force
    * the distributed loop (the parity spec does).
    *
    * Big graphs run the distributed loop: each iteration is a
    * neighbor-min step (one join + one
    * groupBy on the edge list) followed by a pointer-jumping step (adopt
    * your own label's label) — no driver-side graph. Pointer jumping
    * halves label-chain lengths each round, so convergence is
    * O(log diameter): the default 12 iterations covers chains thousands of
    * hops long, and the loop exits early at the fixpoint. Hitting
    * `maxIterations` without converging logs a loud warning — the labels
    * would otherwise silently violate the smallest-member contract.
    *
    * Lineage discipline: the edge list and each iteration's label frame
    * are eagerly checkpointed — otherwise iteration i would lazily re-run
    * the (expensive) upstream pair generation and every prior iteration's
    * joins. When the SparkContext has a reliable checkpoint directory
    * configured (`sc.setCheckpointDir` — HDFS/object store on a real
    * cluster), iterations checkpoint THERE: reliable checkpoints survive
    * executor loss, which unreplicated `localCheckpoint` blocks do not
    * (Spark's own docs forbid localCheckpoint under dynamic allocation —
    * one preempted executor after lineage truncation kills the job).
    * `localCheckpoint` remains only as the no-dir local-mode fallback.
    * Superseded iterations are released explicitly, not left to the
    * ContextCleaner's GC race. */
  def nearDupClusters(
      pairsIn: DataFrame,
      maxIterations: Int = 12,
      driverMaxEdges: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    // The input plan is usually EXPENSIVE (LSH + verify) and this function
    // reads it more than once: the capped fast-path collect re-runs
    // final-stage partitions as CollectLimit scales up (1, 4, 16, ...
    // partitions until the limit or the end — measured ~2x the pair cost
    // at 500k docs), and the distributed loop's edge frame unions two
    // branches over it. Cache it for the duration: released before the
    // fast path returns, or via `pending` after the first loop action.
    // A caller-persisted frame is left alone (their cache, their release).
    val callerCached =
      pairsIn.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val pairs =
      if (callerCached) pairsIn
      else pairsIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idType = pairs.schema("id_a").dataType
    if (driverMaxEdges > 0 && (idType == LongType || idType == IntegerType)) {
      // min BEFORE the +1: driverMaxEdges near Long.MaxValue must clamp,
      // not overflow to a cap of 0 (which would collect nothing and
      // silently return an empty clustering)
      val cap = (math.min(driverMaxEdges, Int.MaxValue - 2L) + 1).toInt
      val edges = pairs
        .filter(col("id_a").isNotNull && col("id_b").isNotNull)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .limit(cap).collect()
      if (edges.length <= driverMaxEdges) {
        if (!callerCached) pairs.unpersist(blocking = false)
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edges.foreach { e =>
          val (a, b) = (e.getLong(0), e.getLong(1))
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val members = parent.keys.toVector
        val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
        members.foreach { id =>
          val r = find(id)
          minOfRoot.update(r, math.min(minOfRoot.getOrElse(r, id), id))
        }
        val spark = pairs.sparkSession
        import spark.implicits._
        return members.map(id => (id, minOfRoot(find(id)))).toDF("id", "cluster_id")
          .select(col("id").cast(idType), col("cluster_id").cast(idType))
      }
      // over the bound: fall through to the distributed loop (the pair
      // frame is recomputed there — one extra pass, amortized by the
      // iterative work that only the big-graph case pays anyway)
    }
    val reliable = pairs.sparkSession.sparkContext.getCheckpointDir.isDefined
    // Reliable path: persist + LAZY checkpoint — the convergence-count job
    // below is the action that materializes each iteration anyway, so an
    // eager checkpoint's own count job would be a pure extra job per
    // iteration. The persist makes the post-action checkpoint write read
    // the cache instead of re-running the iteration's joins; the cache is
    // dropped as soon as the files exist (tracked in `pending`).
    // Checkpoint files are reclaimed by
    // spark.cleaner.referenceTracking.cleanCheckpoints=true (set by
    // graft.Sessions.local) once a frame is unreachable.
    def ckpt(df: DataFrame): (DataFrame, Option[DataFrame]) =
      if (reliable) {
        val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (cached.checkpoint(eager = false), Some(cached))
      } else (df.localCheckpoint(eager = true), None)

    val (edges, edgesCache) = ckpt(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    val (labels0, labels0Cache) = ckpt(
      edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("cluster_id")))
    var labels = labels0
    // pre-checkpoint caches safe to drop after the NEXT action completes
    // (that action's job writes their checkpoint files); the input pair
    // cache rides along — once edges' checkpoint files exist nothing
    // reads the input plan again
    var pending: List[DataFrame] =
      (if (callerCached) Nil else List(pairs)) ++ List(edgesCache, labels0Cache).flatten
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val candidate = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("cluster_id", "nbr"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("nbr")).as("nbr_min"))
      val propagated = labels
        .join(candidate, Seq("id"), "left")
        .select(col("id"), least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
      // pointer jumping: adopt the current label's own label — halves the
      // remaining chain length, turning O(diameter) into O(log diameter)
      val (next, nextCache) = ckpt(propagated.as("a")
        .join(
          propagated.select(col("id").as("cluster_id"), col("cluster_id").as("__parent")).as("b"),
          Seq("cluster_id"), "left")
        .select(
          col("id"),
          least(col("cluster_id"), coalesce(col("__parent"), col("cluster_id"))).as("cluster_id")))
      // the one action per iteration: materializes `next` (and, on the
      // first iteration, edges + the initial labels) — their lazy
      // checkpoints write right after this job, reading the caches
      val changed = next.as("n")
        .join(labels.as("l"), col("n.id") === col("l.id"))
        .filter(col("n.cluster_id") =!= col("l.cluster_id"))
        .limit(1).count()
      pending.foreach(_.unpersist(blocking = false))
      pending = nextCache.toList
      release(labels)
      labels = next
      converged = changed == 0
      i += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] nearDupClusters did NOT converge in $maxIterations iterations — " +
          "cluster_ids may not be the smallest member id; raise maxIterations")
    // the final iteration's cache backs `labels` whose checkpoint files
    // already exist (its changed-count ran) — safe to drop; if the loop
    // never ran, the lazy checkpoints simply fire on the caller's first
    // action with lineage intact
    pending.foreach(_.unpersist(blocking = false))
    release(edges)
    labels
  }

  /** Free a superseded checkpointed frame's storage immediately.
    * `localCheckpoint` blocks otherwise live until the ContextCleaner
    * happens to GC the backing RDD — across an iterative loop (and a long
    * shared session) the accumulated blocks create block-manager pressure
    * and cleaner churn. No-op for reliable checkpoints (files, not
    * blocks — the cleaner reclaims those via cleanCheckpoints). */
  private def release(df: DataFrame): Unit =
    org.apache.spark.sql.graft.Bridge.backingRdd(df).foreach { rdd =>
      if (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        rdd.unpersist(blocking = false)
    }

  /** Cluster-level near-dup dedup: generate MinHash near-dup pairs, resolve
    * them to clusters, keep the smallest id per cluster — documents with no
    * near-dup survive untouched. The full survivor path a curation
    * pipeline wants after pair generation. */
  def nearDupDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 3): DataFrame = {
    val pairs = minhashNearDupPairs(df, idCol, textCol, threshold, shingleK)
    val clusters = nearDupClusters(pairs)
    val losers = clusters.filter(col("id") =!= col("cluster_id")).select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Incremental near-dup pairs: a new `batch` checked against an
    * already-curated `corpus` — the steady-state shape of corpus
    * curation, where corpus×corpus work was paid ONCE and each arriving
    * batch costs only batch-sized signatures plus a bucket join.
    *
    * Both sides band into the same LSH bucket space (identical seeded
    * signatures, so a batch doc lands in exactly the buckets its corpus
    * near-dups occupy); candidates are (batch, corpus) bucket
    * co-occupants, verified by exact shingle Jaccard. Nothing
    * corpus×corpus is ever joined. At 100 TB, persist the corpus's
    * banded-bucket table at curation time and this becomes a join of the
    * batch's buckets against a static bucketed table — the same
    * co-location trick as `Tables.saveBucketed`.
    *
    * Output: (batch `idCol`, `corpus_id`, jaccard ≥ threshold). */
  def minhashNearDupPairsIncremental(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      maxBucket: Int = 1000,
      screenMargin: Double = DefaultScreenMargin): DataFrame = {
    val screen = if (screenMargin > 0) math.max(0.0, threshold - screenMargin) else 0.0
    val keepSig = screen > 0.0
    val numHashes = bands * rowsPerBand
    val bsh = batch.select(col(idCol), shingles(col(textCol), shingleK).as("__sh"))
    val csh = corpus.select(col(idCol), shingles(col(textCol), shingleK).as("__sh"))
    def sideCols(keep: String*) =
      Seq(col("band"), col("bucket")) ++ keep.map(col)
    val bb = bandedBuckets(bsh, idCol, bands, rowsPerBand, maxBucket, keepSig)
      .withColumnRenamed("__sig", "sig_b")
      .select(sideCols(idCol +: (if (keepSig) Seq("sig_b") else Nil): _*): _*)
    val cb = bandedBuckets(csh, idCol, bands, rowsPerBand, maxBucket, keepSig)
      .withColumnRenamed(idCol, "corpus_id")
      .withColumnRenamed("__sig", "sig_c")
      .select(sideCols("corpus_id" +: (if (keepSig) Seq("sig_c") else Nil): _*): _*)
    val joined = bb.join(cb, Seq("band", "bucket"))
    // same signature screen as the self-join path: band-collision false
    // positives grow with corpus size, kill them before the shingle join
    val screened =
      if (keepSig)
        joined.filter(sigScreenKeep(col("sig_b"), col("sig_c"), screen, numHashes))
      else joined
    screened
      .select(col(idCol), col("corpus_id"))
      .distinct()
      .join(bsh.select(col(idCol), col("__sh").as("sh_b")), Seq(idCol))
      .join(csh.select(col(idCol).as("corpus_id"), col("__sh").as("sh_c")), Seq("corpus_id"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_b"), col("sh_c"))).cast("double") /
          size(array_union(col("sh_b"), col("sh_c"))))
      .filter(col("jaccard") >= threshold)
      .select(col(idCol), col("corpus_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Incremental near-dup dedup: the batch rows that survive BOTH gates —
    * no near-dup already in the corpus, and canonical (smallest id) within
    * their in-batch near-dup cluster. The batch-refresh twin of
    * [[incrementalExactDedup]] at near-dup sensitivity. */
  def incrementalNearDupDedup(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      shingleK: Int = 3): DataFrame = {
    val withinSurvivors = nearDupDedup(batch, idCol, textCol, threshold, shingleK)
    val crossMatched = minhashNearDupPairsIncremental(
      batch, corpus, idCol, textCol, threshold, shingleK).select(idCol)
    withinSurvivors.join(crossMatched, Seq(idCol), "left_anti")
  }

  /** Decontaminate a training corpus against an eval set: drop every
    * corpus document whose k-gram overlap covers at least
    * `maxEvalCoverage` of ANY eval document — the enforcement half of
    * [[contaminationReport]] (same broadcast-gram join, so the eval set
    * must be broadcast-sized, which eval sets are). Returns the surviving
    * corpus rows unchanged; the anti-join keys on the report, so the
    * decision thresholds are auditable by running the report itself. */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      maxEvalCoverage: Double = 0.5): DataFrame = {
    require(maxEvalCoverage > 0 && maxEvalCoverage <= 1,
      s"maxEvalCoverage must be in (0,1], got $maxEvalCoverage")
    val contaminated = contaminationReport(corpus, evalSet, idCol, textCol, k, minOverlap = 1)
      .filter(col("eval_coverage") >= maxEvalCoverage)
      .select(col("corpus_id").as(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Train/eval contamination report: for every (corpus doc, eval doc)
    * pair sharing at least `minOverlap` word k-grams, the count of shared
    * distinct grams and the fraction of the eval doc's grams covered — the
    * decontamination check every benchmark-clean training pipeline runs
    * before a corpus ships.
    *
    * Scale: the EVAL side is tiny by construction (benchmarks are
    * thousands of docs, the corpus is billions) — its exploded gram set is
    * explicitly broadcast, so the corpus side streams through a map-side
    * hash join with NO shuffle of corpus grams; the only shuffle is the
    * pair-count groupBy over matched grams, bounded by |matches|, not the
    * corpus. */
  def contaminationReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    val corpusGrams = corpus.select(
      col(idCol).as("corpus_id"),
      explode(hashedShingles(col(textCol), k)).as("g"))
    val evalGrams = evalSet.select(
      col(idCol).as("eval_id"),
      explode(hashedShingles(col(textCol), k)).as("g"))
    val evalSizes = evalGrams.groupBy(col("eval_id")).agg(count(lit(1)).as("eval_grams"))
    corpusGrams
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy(col("corpus_id"), col("eval_id"))
      .agg(count(lit(1)).as("overlap_grams"))
      .filter(col("overlap_grams") >= minOverlap)
      .join(broadcast(evalSizes), Seq("eval_id"))
      .select(
        col("corpus_id"),
        col("eval_id"),
        col("overlap_grams"),
        round(col("overlap_grams").cast("double") / col("eval_grams"), 6)
          .as("eval_coverage"))
  }

  /** Distributed n-gram Jaccard for ALL pairs sharing at least one shingle:
    * explode → join on shingle → pair-count; |A∪B| = |A|+|B|−|A∩B|.
    * Never materializes a cartesian product.
    *
    * `maxShingleDocFreq` (> 0) drops shingles occurring in more documents
    * than the cap BEFORE the self-join — a stop-phrase trigram appearing in
    * millions of documents otherwise contributes quadratic join output on
    * its own. The Jaccard is then computed consistently over the KEPT
    * shingle space (both intersections and sizes exclude the dropped
    * shingles), the standard rare-feature restriction. 0 (default) = exact
    * over all shingles — the oracle-checked mode; set a cap for corpus-
    * scale runs. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      minJaccard: Double = 0.0,
      maxShingleDocFreq: Int = 0): DataFrame = {
    val all = df.select(col(idCol).as("id"), explode(hashedShingles(col(textCol), k)).as("sh"))
    val sh =
      if (maxShingleDocFreq <= 0) all
      else all
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .filter(col("__df") <= maxShingleDocFreq)
        .drop("__df")
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard", col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** ROUGE-L F1 of two token-array columns: `2·LCS / (n_a + n_b)`
    * (Lin 2004 — precision `LCS/n_a`, recall `LCS/n_b`, harmonic mean),
    * rounded to the library's 6-decimal score unit. Both sides empty →
    * null (no content to compare). The LCS runs in the native
    * [[graft.expressions.LcsTokens]] kernel — one codegen'd O(n·m) DP
    * per pair, not interpreted lambdas. */
  def rougeL(aToks: Column, bToks: Column): Column = {
    val lcs = org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.LcsTokens(
        org.apache.spark.sql.graft.Bridge.expression(aToks),
        org.apache.spark.sql.graft.Bridge.expression(bToks)))
    round(lit(2.0) * lcs / (size(aToks) + size(bToks)), 6)
  }

  private def rougeTokens(c: Column, maxTokens: Int): Column =
    slice(filter(split(trim(lower(c)), "\\s+"), t => length(t) > 0),
      1, maxTokens)

  /** Instruction-data near-dup pairs by ROUGE-L (the self-instruct
    * filter, Wang et al. 2023: a candidate instruction is dropped when
    * its ROUGE-L F against the pool is high — word-overlap dedup alone
    * misses reorderings that LCS catches, and LCS alone is uncomputable
    * all-pairs). Candidates come from the MinHash-LSH banding the
    * near-dup family already runs (ROUGE-similar texts share vocabulary,
    * so shingle-Jaccard blocking is the standard candidate generator);
    * each candidate pair is verified with the native LCS kernel and kept
    * at `rouge_l >= threshold`. Output: (id_a, id_b, lcs, rouge_l).
    *
    * Scale shape: banding bounds candidates exactly as
    * [[minhashNearDupPairs]] (capped buckets, no all-pairs); the
    * quadratic DP runs only on candidate pairs and only over the first
    * `maxTokens` tokens per side (instructions are short; the truncation
    * is the documented guard that keeps a stray long document from
    * turning verification quadratic). Like every LSH path, recall is
    * bounded by the banding operating point — and MEASURED: the
    * planted-truth harness ([[graft.tools.Recall]], `rouge_neardup`
    * rows, CI-enforced by RecallSpec) plants F >= 0.9 twins adversarial
    * to shingle banding (boilerplate interleaved every 5 tokens, token
    * dropout, padded paraphrases) and holds >= 0.9 recall at the default
    * 16x2 banding, >= 0.95 at `bands = 32, rowsPerBand = 1` — the
    * recommended operating point for ROUGE workloads (single-row bands
    * collide on ANY shared minhash, catching low-Jaccard/high-ROUGE
    * pairs the 2-row bands screen out, at more candidates per bucket). */
  def rougeLNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      maxTokens: Int = 256,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0,1], got $threshold")
    require(maxTokens > 0, s"maxTokens must be > 0, got $maxTokens")
    val cands = minhashCandidatePairs(df, idCol, textCol, shingleK, bands,
      rowsPerBand, maxBucket)
    val toks = df.select(col(idCol),
      rougeTokens(col(textCol), maxTokens).as("__rt"))
    val lcs = org.apache.spark.sql.graft.Bridge.column(
      graft.expressions.LcsTokens(
        org.apache.spark.sql.graft.Bridge.expression(col("__ta")),
        org.apache.spark.sql.graft.Bridge.expression(col("__tb"))))
    cands
      .join(toks.select(col(idCol).as("id_a"), col("__rt").as("__ta")), Seq("id_a"))
      .join(toks.select(col(idCol).as("id_b"), col("__rt").as("__tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), lcs.as("lcs"),
        round(lit(2.0) * lcs / (size(col("__ta")) + size(col("__tb"))), 6)
          .as("rouge_l"))
      .filter(col("rouge_l") >= threshold)
  }

  /** ROUGE-L dedup enforcement: drop every row with a lower-id ROUGE
    * twin ([[rougeLNearDupPairs]]), keep everything else — the same
    * lowest-id-survives exemplar rule as the other dedup families,
    * applied with the self-instruct verifier. */
  def rougeLDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      maxTokens: Int = 256): DataFrame = {
    val losers = rougeLNearDupPairs(df, idCol, textCol, threshold, maxTokens)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Corpus-level line dedup (the CCNet/RefinedWeb preprocessing step):
    * lines that occur in more than `maxOccurrences` documents corpus-wide
    * are boilerplate (nav bars, cookie banners, footers) and are removed
    * from EVERY document; what survives is each document with only its
    * corpus-unique lines, plus kept/total counts for quality filtering
    * downstream (a doc that loses most of its lines is itself boilerplate).
    *
    * Scale shape: explode to (doc, pos, line), count the DOCUMENTS
    * containing each line (distinct (doc, hash) pairs, then one
    * hash-partitioned groupBy on a 64-bit line hash — the shuffle carries
    * (hash, count), not text; a line repeated inside one document counts
    * once), join the counts back on the hash, and re-aggregate per doc.
    * Like [[bigramLogProb]], a cross-line xxhash64 collision would merge
    * two distinct lines' counts — at 2^-64 per pair that's ~10^-8 even
    * for a billion distinct lines. Reassembly sorts
    * each doc's surviving lines by position INSIDE the aggregate
    * (array_sort of collected structs) — no window, no global sort. The
    * only full-width shuffle is the per-doc regroup, which any
    * reassembling operator pays. */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxOccurrences: Int = 1): DataFrame =
    dedupUnits(df, idCol, textCol, maxOccurrences, "\n", "\n", "lines")

  /** [[dedupLines]] at PARAGRAPH granularity — CCNet's actual dedup unit
    * (Wenzek et al. 2020 §3): paragraphs (blank-line separated blocks)
    * occurring in more than `maxOccurrences` documents corpus-wide drop
    * from every document; survivors rejoin with blank lines. Same scale
    * shape, output columns (n_paragraphs, n_kept, text_deduped). */
  def dedupParagraphs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxOccurrences: Int = 1): DataFrame =
    dedupUnits(df, idCol, textCol, maxOccurrences, "\n{2,}", "\n\n", "paragraphs")

  private def dedupUnits(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxOccurrences: Int,
      splitRe: String,
      joiner: String,
      unitName: String): DataFrame = {
    val lines = df.select(
      col(idCol),
      posexplode(split(col(textCol), splitRe)).as(Seq("pos", "line")))
    // counts keyed by the 64-bit hash: the shuffle for the groupBy and the
    // join carries 16 bytes per distinct line instead of the line text;
    // the distinct collapses within-document repeats so __n is document
    // frequency, matching the contract above
    val counts = lines
      .select(col(idCol), xxhash64(col("line")).as("__lh"))
      .distinct()
      .groupBy(col("__lh"))
      .agg(count(lit(1)).as("__n"))
    val keep = col("__n") <= maxOccurrences
    lines
      .join(counts, xxhash64(col("line")) === col("__lh"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as(s"n_$unitName"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(keep, struct(col("pos"), col("line"))))),
            s => s.getField("line")),
          joiner).as("text_deduped"))
  }

  /** Duplicated-span coverage: per document, the fraction of token
    * positions covered by some word k-gram occurring in >= `minDf`
    * DISTINCT documents — the substring-level duplication signal of the
    * exact-substring dedup literature (a doc that is 80% covered by
    * cross-document spans is boilerplate/mirrored content even when no
    * single pair-level comparison flags it). Complements [[dedupLines]]
    * (line-exact) and [[ngramJaccardPairs]] (pair-level): this is
    * per-document, span-level, corpus-wide.
    *
    * Coverage is the exact union of the [pos, pos+k) intervals of
    * duplicated gram starts, computed with the sorted-starts identity
    * sum(min(k, next_start - start)) — a window PARTITIONED BY document
    * over only the duplicated starts. Scale shape: grams are hashed
    * 64-bit (the df groupBy and self-join shuffle longs, never text;
    * cross-gram collision odds as [[dedupLines]]); doc frequency counts
    * distinct (gram, doc) pairs; short docs (< k tokens) report zero
    * coverage. Output: (id, n_tokens, dup_tokens, dup_fraction). */
  /** Remove corpus-duplicated SPANS from every document — the enforcement
    * half of [[dupSpanCoverage]], the exact-substring dedup step of the
    * dedup literature: every token position covered by some word k-gram
    * occurring in >= `minDf` distinct documents is dropped, and the
    * document is rebuilt from its surviving tokens (boilerplate and
    * mirrored passages disappear from every copy; document-unique prose
    * survives). Complements [[dedupLines]] (line-exact removal) at
    * sub-line granularity.
    *
    * Scale shape: shares [[dupSpanCoverage]]'s derivation — grams are
    * hashed 64-bit, doc frequency counts distinct (gram, doc) pairs, and
    * the coverage explode multiplies only the DUPLICATED starts by k
    * (bounded by k x duplicated positions, not the corpus). The rebuild
    * is the same per-doc regroup with an in-aggregate `array_sort` that
    * [[dedupLines]] pays — no window, no global sort. Output: (id,
    * n_tokens, n_kept, text_deduped). */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minDf: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDf >= 2, s"minDf must be >= 2 (a gram always occurs in its own doc), got $minDf")
    val tks = graft.text.TextAnalysis.tokens(col(textCol))
    val toks = df.select(
      col(idCol),
      posexplode(tks).as(Seq("__pos", "__tok")))
    val starts = df
      .select(
        col(idCol),
        when(size(tks) >= k,
          transform(
            sequence(lit(0), size(tks) - k),
            i => struct(
              i.as("pos"),
              xxhash64(concat_ws(" ", slice(tks, i + 1, lit(k)))).as("g"))))
          .otherwise(array().cast("array<struct<pos:int,g:bigint>>")).as("__gs"))
      .select(col(idCol), explode(col("__gs")).as("__s"))
      .select(col(idCol), col("__s.pos").as("__pos"), col("__s.g").as("__g"))
    val dupGrams = starts
      .select(col("__g"), col(idCol)).distinct()
      .groupBy(col("__g")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__g"))
    val covered = starts
      .join(dupGrams, "__g")
      .select(col(idCol), explode(sequence(col("__pos"), col("__pos") + (k - 1))).as("__pos"))
      .distinct()
    toks
      .join(covered, Seq(idCol, "__pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tok")))),
            s => s.getField("__tok")),
          " ").as("text_deduped"))
      .join(df.select(col(idCol), size(tks).cast("long").as("n_tokens")), Seq(idCol), "right")
      .na.fill(0L, Seq("n_kept"))
      .na.fill("", Seq("text_deduped"))
      .select(col(idCol), col("n_tokens"), col("n_kept"), col("text_deduped"))
  }

  def dupSpanCoverage(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      minDf: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDf >= 2, s"minDf must be >= 2 (a gram always occurs in its own doc), got $minDf")
    val tks = graft.text.TextAnalysis.tokens(col(textCol))
    val starts = df
      .select(
        col(idCol),
        size(tks).as("__n"),
        when(size(tks) >= k,
          transform(
            sequence(lit(0), size(tks) - k),
            i => struct(
              i.as("pos"),
              xxhash64(concat_ws(" ", slice(tks, i + 1, lit(k)))).as("g"))))
          .otherwise(array().cast("array<struct<pos:int,g:bigint>>")).as("__gs"))
      .select(col(idCol), col("__n"), explode(col("__gs")).as("__s"))
      .select(col(idCol), col("__n"), col("__s.pos").as("__pos"), col("__s.g").as("__g"))
    val dupGrams = starts
      .select(col("__g"), col(idCol)).distinct()
      .groupBy(col("__g")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
    val covered = starts
      .join(dupGrams, "__g")
      .withColumn("__next", lead(col("__pos"), 1).over(w))
      .groupBy(col(idCol))
      .agg(sum(least(lit(k), coalesce(col("__next") - col("__pos"), lit(k))))
        .as("dup_tokens"))
    df.select(col(idCol), size(tks).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .na.fill(0L, Seq("dup_tokens"))
      .withColumn("dup_fraction",
        round(col("dup_tokens") / greatest(col("n_tokens"), lit(1L)), 6))
  }
}
