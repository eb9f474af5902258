package graft.dedup

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable MinHash-LSH dedup index: the corpus side of incremental
  * near-dup dedup, paid ONCE.
  *
  * [[Dedup.minhashNearDupPairsIncremental]] promises "corpus×corpus was
  * paid once at curation time, never again" — but the one-shot call still
  * re-shingles and re-bands the corpus TEXT on every invocation. This
  * index persists what that pass produces, so steady-state batches never
  * touch corpus text again:
  * {{{
  *   <dir>/meta.parquet      1 row: id_col, shingle_k, bands, rows_per_band,
  *                           max_bucket, n_rows
  *   <dir>/buckets.parquet   (band, bucket, id) — the banded-LSH address
  *                           table, (band, bucket)-sorted for row-group
  *                           locality on the candidate join
  *   <dir>/shingles.parquet  (id, __sh) — the shingle arrays the exact
  *                           Jaccard verification joins against
  * }}}
  *
  * Per-batch work: shingle+band the BATCH, one (band, bucket) join
  * against the persisted address table, one id join against the persisted
  * shingles for verification — O(|batch| + matched candidates), never a
  * corpus scan of text. Accepted batches [[append]] their own
  * buckets+shingles, keeping the index current; the same seeded hash
  * family guarantees old and new rows share one bucket space.
  *
  * Results are IDENTICAL to the one-shot operators at equal parameters
  * (the hash family is deterministic; asserted in MinHashIndexSpec).
  */
object MinHashIndex {

  private val MetaFile = "meta.parquet"

  private case class Meta(
      idCol: String, shingleK: Int, bands: Int, rowsPerBand: Int,
      maxBucket: Int, nRows: Long)

  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit = {
    import spark.implicits._
    Seq((m.idCol, m.shingleK, m.bands, m.rowsPerBand, m.maxBucket, m.nRows))
      .toDF("id_col", "shingle_k", "bands", "rows_per_band", "max_bucket", "n_rows")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$MetaFile")
  }

  private def readMeta(spark: SparkSession, dir: String): Meta = {
    require(exists(spark, dir), s"no MinHash index at $dir — build one first")
    // driver-side 1-row read — no Spark job per meta resolution (r20;
    // see graft.io.DriverParquet)
    graft.io.DriverParquet.readSingleRow(spark, s"$dir/$MetaFile")(g =>
      Meta(
        g.getString("id_col", 0), g.getInteger("shingle_k", 0),
        g.getInteger("bands", 0), g.getInteger("rows_per_band", 0),
        g.getInteger("max_bucket", 0), g.getLong("n_rows", 0)))
  }

  /** The id column the index was built with — for callers aligning
    * external state with index-served results (e.g. the streaming corpus
    * maintainer's replay reconciliation). */
  def idColumn(spark: SparkSession, dir: String): String = readMeta(spark, dir).idCol

  /** True iff a complete index exists at `dir` (meta written last). */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$MetaFile/_SUCCESS")
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  private def shingled(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), Dedup.shingles(col(textCol), k).as("__sh"))

  private val TombstoneFile = "tombstones.parquet"

  private def hasTombstones(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$TombstoneFile")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Anti-join the tombstone set against `df` on `joinCol` (the corpus
    * side may ride under a renamed id, e.g. `corpus_id` in [[pairs]]). */
  private def minusTombstones(
      spark: SparkSession, dir: String, m: Meta, joinCol: String,
      df: DataFrame): DataFrame =
    if (!hasTombstones(spark, dir)) df
    else df.join(
      spark.read.parquet(s"$dir/$TombstoneFile").select(col(m.idCol).as(joinCol)),
      Seq(joinCol), "left_anti")

  /** Delete indexed documents by id — the retraction path
    * (decontamination hits, takedowns) that previously required a full
    * [[build]] rebuild. Tombstone semantics identical to
    * [[graft.similarity.AnnIndex.deleteIds]]: id-frame-sized write now,
    * probes anti-join the set (candidate-sized cost, the bucket join
    * already pruned), [[compact]] folds it into both layers physically.
    * A tombstoned id stays deleted until a compact folds the set — an
    * [[append]] that re-uses a pending-tombstone id refuses loudly
    * (fold first, then re-append); the new row is never silently
    * masked. */
  def deleteIds(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    val m = readMeta(spark, dir)
    require(ids.columns.contains(m.idCol),
      s"deleteIds: the ids frame must carry the index id column " +
        s"'${m.idCol}' (got ${ids.columns.mkString(", ")})")
    graft.io.Compaction.requireNoPendingPublish(spark, s"$dir/$TombstoneFile")
    ids.select(col(m.idCol)).distinct()
      .coalesce(1).write.mode(SaveMode.Append).parquet(s"$dir/$TombstoneFile")
  }

  /** Ids the persisted index currently SERVES: stored rows minus pending
    * tombstones. Column-pruned read of the BUCKET table's id column (the
    * layer [[append]] writes last, so an id listed here has both its
    * layers committed); shingle bytes are never deserialized. The re-run
    * guard of the incremental release jobs: anti-join a batch against
    * this before appending and a replayed release appends nothing instead
    * of duplicate index rows. Pending-TOMBSTONE ids are deliberately NOT
    * listed even though their rows still occupy the layers: a re-accepted
    * id that was retracted must reach [[append]] and surface as the loud
    * collision refusal (fold first), never be silently skipped by the
    * guard — skipped meant published-but-unindexed, permanently, once the
    * fold erased the rows. */
  def indexedIds(spark: SparkSession, dir: String): DataFrame = {
    val m = readMeta(spark, dir)
    minusTombstones(spark, dir, m, m.idCol,
      spark.read.parquet(s"$dir/buckets.parquet").select(col(m.idCol)).distinct())
  }

  /** Shingle + band the corpus once and persist both layers. */
  def build(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      shingleK: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 2,
      maxBucket: Int = 1000): Unit = {
    val spark = corpus.sparkSession
    val nRows = corpus.count()
    val sh = shingled(corpus, idCol, textCol, shingleK)
    sh.write.mode(SaveMode.Overwrite).parquet(s"$dir/shingles.parquet")
    // band from the PERSISTED shingles: one text pass total, and the
    // bucket table is exactly consistent with the stored arrays. The
    // bucket rows CARRY the minhash signature (keepSig) so probes can
    // screen band-collision candidates without touching the (much
    // heavier) shingle layer — see Dedup.minhashNearDupPairsPreShingled.
    val persistedSh = spark.read.parquet(s"$dir/shingles.parquet")
    Dedup.bandedBuckets(persistedSh, idCol, bands, rowsPerBand, maxBucket, keepSig = true)
      .sortWithinPartitions(col("band"), col("bucket"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/buckets.parquet")
    writeMeta(spark, dir, Meta(idCol, shingleK, bands, rowsPerBand, maxBucket, nRows))
  }

  /** Cross near-dup pairs of a batch against the INDEXED corpus:
    * (batch id, corpus_id, jaccard) for every verified pair at or above
    * `threshold`. The batch is shingled and banded here; the corpus comes
    * entirely from the persisted layers.
    *
    * Self-pairs are excluded (batch id ≠ corpus_id, mirroring
    * [[graft.similarity.AnnIndex.searchIvf]]'s query-id exclusion): a
    * re-submitted batch whose docs were already appended matches only
    * OTHER corpus docs, never its own index entries at jaccard 1.0 — so a
    * replayed release dedups idempotently instead of self-annihilating.
    * PRECONDITION of that exclusion: ids are unique ACROSS batch and
    * corpus — a batch doc that legitimately reuses the id of a DIFFERENT
    * corpus doc (id collision across sources) is excluded from matching
    * against that doc too. The shipped release jobs satisfy this by
    * construction (xxhash64-assigned ids + the [[indexedIds]] re-run
    * guard); callers feeding externally-minted ids must ensure the same
    * before relying on pairs() for cross-source dedup. */
  def pairs(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      textCol: String,
      threshold: Double,
      screenMargin: Double = Dedup.DefaultScreenMargin): DataFrame = {
    val m = readMeta(spark, dir)
    val bucketsRaw = spark.read.parquet(s"$dir/buckets.parquet")
    // indexes written before the signature column existed (or with
    // screening disabled) still probe correctly — just unscreened
    val screen =
      if (screenMargin > 0 && bucketsRaw.columns.contains("__sig"))
        math.max(0.0, threshold - screenMargin)
      else 0.0
    val bsh = shingled(batch, m.idCol, textCol, m.shingleK)
    val bb = Dedup.bandedBuckets(bsh, m.idCol, m.bands, m.rowsPerBand, m.maxBucket,
        keepSig = screen > 0)
      .withColumnRenamed("__sig", "sig_b")
    // tombstoned corpus docs drop from the candidate pool here — the
    // bucket join then never surfaces them, and the shingle-verify join
    // (inner on corpus_id) is filtered transitively
    val cb = minusTombstones(spark, dir, m, "corpus_id", bucketsRaw
      .withColumnRenamed(m.idCol, "corpus_id")
      .withColumnRenamed("__sig", "sig_c"))
    val joined = bb.join(cb, Seq("band", "bucket"))
      .filter(col(m.idCol) =!= col("corpus_id"))
    val screened =
      if (screen > 0)
        // null sig_c = a legacy row inside a mixed-schema index (written
        // before append matched schemas): keep it unscreened — the exact
        // Jaccard verify still gates it — rather than silently dropping
        // every candidate against the original corpus
        joined.filter(col("sig_c").isNull ||
          Dedup.sigScreenKeep(
            col("sig_b"), col("sig_c"), screen, m.bands * m.rowsPerBand))
      else joined
    val csh = spark.read.parquet(s"$dir/shingles.parquet")
    screened
      .select(col(m.idCol), col("corpus_id"))
      .distinct()
      .join(bsh.select(col(m.idCol), col("__sh").as("sh_b")), Seq(m.idCol))
      .join(csh.select(col(m.idCol).as("corpus_id"), col("__sh").as("sh_c")), Seq("corpus_id"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_b"), col("sh_c"))).cast("double") /
          size(array_union(col("sh_b"), col("sh_c"))))
      .filter(col("jaccard") >= threshold)
      .select(col(m.idCol), col("corpus_id"), round(col("jaccard"), 6).as("jaccard"))
      // duplicate corpus shingle rows (the append crash window between
      // the shingle and bucket writes, re-appended by a replay — see
      // [[compact]], which heals them physically) fan the verify join
      // into duplicate pair rows; the duplicates are byte-identical
      // (deterministic shingling), so an output-sized dedup restores
      // exact pair semantics until the next maintenance fold
      .dropDuplicates(m.idCol, "corpus_id")
  }

  /** Batch survivors against the indexed corpus: rows with no near-dup
    * already indexed AND canonical (smallest id) within their in-batch
    * near-dup cluster — [[Dedup.incrementalNearDupDedup]] with the corpus
    * side served from the index. */
  def dedupBatch(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      textCol: String,
      threshold: Double): DataFrame = {
    val m = readMeta(spark, dir)
    val withinSurvivors = Dedup.nearDupDedup(batch, m.idCol, textCol, threshold, m.shingleK)
    val crossMatched = pairs(spark, dir, batch, textCol, threshold).select(m.idCol)
    withinSurvivors.join(crossMatched, Seq(m.idCol), "left_anti")
  }

  /** Append (typically already-deduped) batch rows to the index: their
    * shingles and banded buckets land in the persisted layers, so later
    * batches dedup against them too. Batch-sized work; the same
    * deterministic hash family keeps one bucket space across appends.
    *
    * The `maxBucket` cap applies WITHIN each write (build caps the
    * corpus, every append caps its own batch) — a pathological bucket
    * can therefore grow by up to `maxBucket` per append. That mirrors
    * the one-shot incremental operator's per-frame capping; if the
    * address table accretes hot buckets over many appends, a [[build]]
    * rebuild re-caps globally. */
  def append(
      spark: SparkSession,
      dir: String,
      batch: DataFrame,
      textCol: String): Unit = {
    val m = readMeta(spark, dir)
    // the shingle append is blind (the bucket append reads its table's
    // schema first and fails loudly on an absent path): refuse while a
    // crashed compaction publish is pending — recreating the live path
    // with one batch's rows would orphan the backup holding the corpus
    graft.io.Compaction.requireNoPendingPublish(spark, s"$dir/shingles.parquet")
    graft.io.Compaction.requireNoPendingPublish(spark, s"$dir/buckets.parquet")
    // a batch id pending deletion would land as a row the tombstone
    // anti-join keeps masking — silent data loss until the next fold.
    // Refuse loudly instead (the only uniformly safe cheap option:
    // un-tombstoning would resurrect the RETRACTED old row alongside
    // the new one). Id-frame-sized semi-join; repair = compact() first.
    if (hasTombstones(spark, dir)) {
      val colliding = batch.select(col(m.idCol)).distinct()
        .join(spark.read.parquet(s"$dir/$TombstoneFile").select(col(m.idCol)),
          Seq(m.idCol), "left_semi")
        .limit(4).collect().map(_.get(0))
      require(colliding.isEmpty,
        s"append: batch id(s) ${colliding.mkString(", ")}${if (colliding.length == 4) ", …" else ""} " +
          s"are pending tombstones in $dir — the appended rows would be " +
          "invisible at probe until the next fold. Run compact() to fold " +
          "the deletions first, or re-submit under new ids.")
    }
    val bsh = shingled(batch, m.idCol, textCol, m.shingleK)
    bsh.write.mode(SaveMode.Append).parquet(s"$dir/shingles.parquet")
    // match the EXISTING bucket table's schema: appending __sig rows into
    // a pre-signature index would mix file schemas, and a later probe
    // that sees the __sig column would read null signatures for every
    // legacy row — the screen filter would then silently drop all
    // candidates against the original corpus. A legacy index stays
    // legacy (unscreened) until a build() rebuild.
    val hasSig = spark.read.parquet(s"$dir/buckets.parquet")
      .columns.contains("__sig")
    Dedup.bandedBuckets(bsh, m.idCol, m.bands, m.rowsPerBand, m.maxBucket,
        keepSig = hasSig)
      .sortWithinPartitions(col("band"), col("bucket"))
      .write.mode(SaveMode.Append).parquet(s"$dir/buckets.parquet")
    writeMeta(spark, dir, m.copy(nRows = m.nRows + batch.count()))
  }

  /** Operational one-row health report — the
    * [[graft.similarity.AnnIndex.stats]] twin for the dedup index:
    * indexed rows vs pending tombstones, banding params, and layout
    * decay (file count + bytes per layer — the small-file signal
    * [[compact]] repairs). File listings + meta only, never a data
    * scan except the tombstone-count distinct (id-frame-sized). */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = readMeta(spark, dir)
    def fileStats(sub: String): (Long, Long) =
      graft.io.Compaction.partFileStats(spark, s"$dir/$sub")
    val (bf, bb) = fileStats("buckets.parquet")
    val (sf, sb) = fileStats("shingles.parquet")
    val tombs =
      if (!hasTombstones(spark, dir)) 0L
      else spark.read.parquet(s"$dir/$TombstoneFile").distinct().count()
    Seq((m.idCol, m.nRows, tombs, m.bands, m.rowsPerBand, m.shingleK,
        bf, bb, sf, sb))
      .toDF("id_col", "n_rows", "pending_tombstones", "bands",
        "rows_per_band", "shingle_k", "bucket_files", "bucket_bytes",
        "shingle_files", "shingle_bytes")
  }

  /** Stats-driven maintenance — [[graft.similarity.AnnIndex.maintain]]'s
    * twin for the dedup index, same report schema (kind `minhash`, the
    * shard columns neutral — this layout is unsharded): fold when pending
    * tombstones exceed `tombstoneRatio` of rows or when the two layers'
    * file count exceeds `fileDecay` × what one [[compact]] would leave
    * (≥ 2 — one file per layer — or bytes/targetFileMB). At most one fold
    * per call; under thresholds a pure no-op read. */
  def maintain(
      spark: SparkSession,
      dir: String,
      tombstoneRatio: Double = 0.1,
      fileDecay: Double = 4.0,
      targetFileMB: Int = 128): DataFrame = {
    import spark.implicits._
    val st = stats(spark, dir).head()
    val nRows = st.getAs[Long]("n_rows")
    val pending = st.getAs[Long]("pending_tombstones")
    val files = st.getAs[Long]("bucket_files") + st.getAs[Long]("shingle_files")
    val bytes = st.getAs[Long]("bucket_bytes") + st.getAs[Long]("shingle_bytes")
    val pendingRatio = if (nRows > 0) pending.toDouble / nRows else 0.0
    val ideal = math.max(2L,
      math.ceil(bytes / (targetFileMB * 1024.0 * 1024.0)).toLong)
    val decay = files.toDouble / ideal
    val compactReasons = Seq(
      if (pendingRatio > tombstoneRatio)
        Some(f"tombstones: $pending/$nRows = $pendingRatio%.4f > $tombstoneRatio%.4f")
      else None,
      if (decay > fileDecay)
        Some(f"file decay: $files files vs ideal $ideal = $decay%.2f× > $fileDecay%.2f×")
      else None).flatten
    if (compactReasons.nonEmpty) compact(spark, dir, targetFileMB)
    Seq(("minhash", nRows, pending, pendingRatio, files, ideal, decay, 1.0,
        compactReasons.nonEmpty, false,
        if (compactReasons.isEmpty) "healthy: under all thresholds"
        else compactReasons.mkString("; ")))
      .toDF("kind", "n_rows", "pending_tombstones", "pending_ratio",
        "data_files", "ideal_files", "file_decay", "shard_skew",
        "compacted", "reshard_recommended", "reason")
  }

  /** Compact the index's appended layers — every [[append]] (and each
    * streaming corpus-maintainer micro-batch riding it) lands new small
    * files in BOTH tables, and at steady state the per-batch candidate
    * join pays per-file open costs instead of data bytes. Rewrites
    * buckets (band, bucket)-ordered — restoring the row-group locality
    * the build laid down, which appends interleave — and shingles
    * id-ordered, via the shared staged-rewrite/checked-rename core
    * ([[graft.io.Compaction]]; crash recovery included). Probe results
    * are identical before/after (MinHashIndexSpec). */
  def compact(spark: SparkSession, dir: String, targetFileMB: Int = 128): Unit = {
    val m = readMeta(spark, dir)
    // pending tombstones fold into both rewrites (same contract as
    // AnnIndex.compact: staged survivor set is count-verified, the
    // tombstone table drops after the publish, n_rows refreshes; a crash
    // between the two is idempotent — folded ids anti-join as no-ops)
    val tombed = hasTombstones(spark, dir)
    def fold(joinCol: String): DataFrame => DataFrame =
      if (!tombed) identity
      else minusTombstones(spark, dir, m, joinCol, _)
    graft.io.Compaction.compactParquet(spark, s"$dir/buckets.parquet",
      Seq("band", "bucket"), None, targetFileMB, fold(m.idCol))
    // the shingle rewrite also folds duplicate rows per id: a crash
    // between append's shingle write (first) and bucket write (second)
    // leaves committed shingle rows for ids [[indexedIds]] (bucket-keyed)
    // does not list, so the replay guard legitimately re-appends them —
    // duplicate shingle rows that [[pairs]] screens at probe time and
    // THIS fold heals physically. Shingling is deterministic, so the
    // duplicates are byte-identical; keeping any one is exact.
    val after = graft.io.Compaction.compactParquet(spark, s"$dir/shingles.parquet",
      Seq(m.idCol), None, targetFileMB,
      fold(m.idCol).andThen(_.dropDuplicates(m.idCol)))
    if (tombed) {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$TombstoneFile")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      writeMeta(spark, dir, m.copy(nRows = after))
    }
  }
}
