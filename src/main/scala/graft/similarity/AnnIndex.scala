package graft.similarity

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable ANN index: build once, search many.
  *
  * [[Similarity.ivfCosineTopK]] / [[Similarity.lshCosineTopK]] are one-shot
  * conveniences that rebuild their structure (k-means fit + corpus
  * assignment / corpus re-signing) inside every call. At 100 TB that
  * repeated corpus pass is the dominant cost: the fit-once/persist/
  * load-and-score lifecycle (the reference's model-serving shape,
  * utils.py:212-222, production/scoring.py:117) is build-index/persist/
  * search-many here.
  *
  * On-disk layout (all plain parquet — readable by any engine):
  * {{{
  *   <dir>/meta.parquet       1 row: kind, id_col, params, n_rows
  *   <dir>/centroids.parquet  IVF: (__cell, __cent)           [nlist rows]
  *   <dir>/corpus.parquet/    IVF: (id, __cv, __cn, attrs…) PARTITIONED BY __cell
  *   <dir>/signatures.parquet LSH: (id, __cv, __cv_n, sig, attrs…)
  *                            PARTITIONED BY table, sig-sorted within files
  *   <dir>/shard=<i>/…        sharded IVF / IVF-PQ: one complete index
  *                            per xxhash64(id)-slice + a top-level meta
  *                            (kind ivf_sharded / ivfpq_sharded, tables
  *                            = shard count) written last
  * }}}
  *
  * Why this layout scales:
  *   - IVF search collects the probed cells (|Q|·nprobe values — the query
  *     frame is broadcast-sized by contract) and pushes a LITERAL
  *     `__cell IN (...)` filter, so hive partition pruning skips every
  *     unprobed cell's directory BEFORE any IO: a search touches
  *     ~nprobe/nlist of the corpus bytes, not all of them.
  *   - LSH search pushes the probed signature set as a parquet predicate;
  *     files are sig-sorted within each table partition, so row-group
  *     min/max stats skip the buckets no query probes.
  *   - Both searches reuse the exact scoring tails of the one-shot
  *     operators ([[Similarity.ivfScore]] / [[Similarity.lshScore]]), so
  *     one-shot and prebuilt results are IDENTICAL for identical
  *     parameters (asserted in AnnIndexSpec) — the index changes where
  *     the structure lives, never what the search returns.
  *
  * Incremental maintenance is append-shaped: new corpus batches are
  * assigned against the SAME persisted centroids/planes and appended to
  * the partitioned layout; periodic re-fit is a rebuild.
  */
object AnnIndex {

  private val MetaFile = "meta.parquet"

  private case class Meta(
      kind: String,
      idCol: String,
      nRows: Long,
      nlist: Int,
      tables: Int,
      bits: Int,
      seed: Long,
      quantized: Boolean)

  private def writeMeta(spark: SparkSession, dir: String, m: Meta): Unit = {
    import spark.implicits._
    Seq((m.kind, m.idCol, m.nRows, m.nlist, m.tables, m.bits, m.seed, m.quantized))
      .toDF("kind", "id_col", "n_rows", "nlist", "tables", "bits", "seed", "quantized")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/$MetaFile")
  }

  private def readMeta(spark: SparkSession, dir: String, expectKind: String): Meta = {
    val m = readMetaAny(spark, dir, expectKind)
    require(m.kind == expectKind,
      s"index at $dir is kind '${m.kind}', expected '$expectKind'")
    m
  }

  /** Read the 1-row meta file ON THE DRIVER (plain parquet-hadoop read)
    * instead of through a `spark.read.parquet(...).head()` job. The meta
    * is a single tiny file, but the Spark formulation paid file listing +
    * query planning + a scheduled 1-task job PER CALL — and the sharded
    * searches call this 2-3× per shard (parent meta, shard meta, probe
    * resolution), so a 3-shard search spent more driver time reading
    * 8-field metas than planning the actual scoring job (r20 job
    * profile). Same bytes, same fields, no job. */
  private def readMetaAny(spark: SparkSession, dir: String, expectKind: String): Meta = {
    require(exists(spark, dir),
      s"no ANN index at $dir — build one with build${expectKind.capitalize} first")
    graft.io.DriverParquet.readSingleRow(spark, s"$dir/$MetaFile")(g =>
      Meta(
        g.getString("kind", 0), g.getString("id_col", 0), g.getLong("n_rows", 0),
        g.getInteger("nlist", 0), g.getInteger("tables", 0), g.getInteger("bits", 0),
        g.getLong("seed", 0), g.getBoolean("quantized", 0)))
  }

  /** Corpus rows in their stored form: full-precision keeps the raw
    * vector; quantized swaps it for int8 codes + a per-vector scale
    * (4-8× fewer scan bytes — at 100 TB of embeddings the quantized
    * layout is what stays hot). The stored norm is the DEQUANTIZED
    * norm, so search-time scoring (dot(dq)/(||dq||·||q||)) is
    * internally consistent. */
  private def storedForm(assigned: DataFrame, quantize: Boolean): DataFrame =
    if (!quantize) assigned
    else assigned
      .withColumn("__q", Similarity.quantizeInt8(col("__cv")))
      .withColumn("__cn", Similarity.l2Norm(Similarity.dequantizeInt8(col("__q"))))
      .drop("__cv")

  /** Cluster a cell-partitioned write so each cell lands in ONE file
    * (hash-repartition on `__cell`: every cell's rows reach exactly one
    * task, write parallelism stays at the shuffle-partition count).
    * Without this, `partitionBy` makes every task emit a file into
    * every cell directory it holds rows for — tasks × cells small
    * files from the very first build, paying the decay
    * [[graft.io.Compaction]] exists to REPAIR at birth instead of
    * avoiding it. Costs one shuffle of the stored payload — cheap
    * relative to the fit, and the probe-pruned search then opens
    * `nprobe` files instead of `nprobe × tasks`. */
  private def clusterByCell(stored: DataFrame): DataFrame =
    stored.repartition(col("__cell"))

  /** Inverse of [[storedForm]] at read time. */
  private def scoringForm(stored: DataFrame, quantized: Boolean): DataFrame =
    if (!quantized) stored
    else stored
      .withColumn("__cv", Similarity.dequantizeInt8(col("__q")))
      .drop("__q")

  /** The kind ("ivf" | "lsh") of the complete index at `dir`. */
  def kindOf(spark: SparkSession, dir: String): String = {
    require(exists(spark, dir), s"no ANN index at $dir")
    readMetaAny(spark, dir, "ann").kind
  }

  /** True iff a complete index exists at `dir` (meta is written LAST by
    * the builders, so a crashed half-written build reads as absent). */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/$MetaFile")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.exists(new org.apache.hadoop.fs.Path(s"$dir/$MetaFile/_SUCCESS"))
  }

  // ------------------------------------------------------------- deletion

  private val TombstoneFile = "tombstones.parquet"

  private def hasTombstones(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$TombstoneFile")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Drop tombstoned ids from a candidate frame — applied AFTER the
    * partition/signature pruning in every search, so the anti-join costs
    * candidate-sized work (|Q|·nprobe·cell-occupancy rows), never a
    * corpus scan; the tombstone side is takedown-sized and AQE broadcasts
    * it at runtime. */
  private def minusTombstones(
      spark: SparkSession, dir: String, idCol: String,
      df: DataFrame): DataFrame =
    if (!hasTombstones(spark, dir)) df
    else df.join(
      spark.read.parquet(s"$dir/$TombstoneFile").select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Refuse an append whose batch re-uses an id pending deletion: the new
    * row would land physically but every search's tombstone anti-join
    * would keep masking it — silent data loss until the next fold. Loud
    * refusal is the only uniformly SAFE cheap option (un-tombstoning the
    * colliding ids would resurrect the retracted OLD row alongside the
    * new one — exactly wrong for a takedown). Id-frame-sized semi-join
    * against the takedown-sized tombstone table; repair = [[compact]]
    * (folds the deletions physically), then re-append. */
  private def requireNoTombstoneCollisions(
      spark: SparkSession, dir: String, idCol: String,
      batch: DataFrame): Unit =
    if (hasTombstones(spark, dir)) {
      val colliding = batch.select(col(idCol)).distinct()
        .join(spark.read.parquet(s"$dir/$TombstoneFile").select(col(idCol)),
          Seq(idCol), "left_semi")
        .limit(4).collect().map(_.get(0))
      require(colliding.isEmpty,
        s"append: batch id(s) ${colliding.mkString(", ")}${if (colliding.length == 4) ", …" else ""} " +
          s"are pending tombstones in $dir — the appended rows would be " +
          "invisible at search until the next fold. Run compact() to fold " +
          "the deletions first, or re-submit under new ids.")
    }

  /** Ids the persisted index currently SERVES: stored rows minus pending
    * tombstones. Column-pruned read of the data table's id column;
    * vector/code bytes are never deserialized. Sharded indexes union
    * their shards (each applying its own tombstones). The re-run guard of
    * the incremental release jobs: anti-join a batch against this before
    * appending and a replayed release appends nothing instead of
    * accumulating duplicate ids in the served index. Pending-TOMBSTONE
    * ids are deliberately NOT listed even though their rows still occupy
    * the layout: a re-accepted id that was retracted must reach the
    * append and surface as the loud collision refusal (fold first), never
    * be silently skipped by the guard — skipped meant
    * published-but-unindexed, permanently, once the fold erased the
    * rows. */
  def indexedIds(spark: SparkSession, dir: String): DataFrame = {
    val kind = kindOf(spark, dir)
    val m = readMeta(spark, dir, kind)
    kind match {
      case "ivf" | "ivfpq" =>
        minusTombstones(spark, dir, m.idCol,
          spark.read.parquet(s"$dir/corpus.parquet").select(col(m.idCol)).distinct())
      case "lsh" =>
        minusTombstones(spark, dir, m.idCol,
          spark.read.parquet(s"$dir/signatures.parquet").select(col(m.idCol)).distinct())
      case "ivf_sharded" | "ivfpq_sharded" =>
        (0 until m.tables).map(sh => indexedIds(spark, s"$dir/shard=$sh"))
          .reduce(_ unionByName _)
      case other => throw new IllegalArgumentException(
        s"indexedIds: unknown index kind '$other' at $dir")
    }
  }

  /** Delete rows from a persisted index by id — the curation retraction
    * path (decontamination hits, takedowns, re-filtered documents) that
    * previously required a full rebuild from source. Deletion is a
    * TOMBSTONE: the ids land in `<dir>/tombstones.parquet` (id-frame-
    * sized work — the index bytes are untouched), every search anti-joins
    * them after its pruning (candidate-sized cost), and the next
    * [[compact]] folds them into the data files physically and drops the
    * tombstone table. Sharded indexes route each id to its owning shard's
    * tombstones, so per-shard searches stay self-contained.
    *
    * Contracts:
    *  - `ids` must carry the index's id column (extra columns ignored).
    *  - Unknown ids are harmless (the anti-join ignores them).
    *  - meta `n_rows` keeps counting tombstoned rows until the fold —
    *    auto-nprobe stays calibrated on the stored layout it scans; the
    *    fold refreshes it to the surviving count.
    *  - A tombstoned id stays deleted until a [[compact]] folds the
    *    tombstones: an append that re-uses a pending-tombstone id
    *    REFUSES loudly (fold first, then re-append) — the new row is
    *    never silently masked, and the retracted old row is never
    *    resurrected.
    *  - Same single-maintainer rule as appends/compaction. */
  def deleteIds(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    require(exists(spark, dir), s"no ANN index at $dir — nothing to delete from")
    val kind = kindOf(spark, dir)
    val m = readMeta(spark, dir, kind)
    require(ids.columns.contains(m.idCol),
      s"deleteIds: the ids frame must carry the index id column " +
        s"'${m.idCol}' (got ${ids.columns.mkString(", ")})")
    val sel = ids.select(col(m.idCol)).distinct()
    kind match {
      case "ivf" | "ivfpq" | "lsh" =>
        graft.io.Compaction.requireNoPendingPublish(spark, s"$dir/$TombstoneFile")
        // one file per delete call: takedown sets are id-frame-sized,
        // and the table is itself folded away at the next compact
        sel.coalesce(1).write.mode(SaveMode.Append).parquet(s"$dir/$TombstoneFile")
      case "ivf_sharded" | "ivfpq_sharded" =>
        val routed = sel.withColumn("__shard", shardOf(col(m.idCol), m.tables))
          .persist()
        try routed.select(col("__shard")).distinct()
          .collect().map(_.getInt(0)).sorted
          .foreach(sh => deleteIds(spark, s"$dir/shard=$sh",
            routed.filter(col("__shard") === sh).drop("__shard")))
        finally routed.unpersist()
      case other => throw new IllegalArgumentException(
        s"deleteIds: unknown index kind '$other' at $dir")
    }
  }

  /** Operational one-row health report for a persisted index — what an
    * operator checks before deciding to compact, fold, or reshard:
    * row counts (stored vs pending tombstones), layout decay (data file
    * count + bytes — the small-file signal `compact` repairs), and the
    * structure scale (cells/tables, shards). Sharded indexes aggregate
    * across shards. Pure file-listing + meta reads — never scans data
    * rows, so it is safe to call from a monitoring cadence. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    require(exists(spark, dir), s"no ANN index at $dir")
    val kind = kindOf(spark, dir)
    val m = readMeta(spark, dir, kind)
    def fileStats(sub: String): (Long, Long) =
      graft.io.Compaction.partFileStats(spark, s"$dir/$sub")
    def tombstoneCount(d: String): Long =
      if (!hasTombstones(spark, d)) 0L
      else spark.read.parquet(s"$d/$TombstoneFile").distinct().count()
    kind match {
      case "ivf" | "ivfpq" | "lsh" =>
        val dataTable = if (kind == "lsh") "signatures.parquet" else "corpus.parquet"
        val (files, bytes) = fileStats(dataTable)
        val cells = if (kind == "lsh") m.tables else m.nlist
        Seq((kind, m.idCol, m.nRows, tombstoneCount(dir), cells, 1,
            files, bytes, m.quantized, m.nRows, m.nRows))
          .toDF("kind", "id_col", "n_rows", "pending_tombstones",
            "cells_or_tables", "n_shards", "data_files", "data_bytes",
            "quantized", "shard_rows_min", "shard_rows_max")
      case "ivf_sharded" | "ivfpq_sharded" =>
        val inner = if (kind == "ivf_sharded") "ivf" else "ivfpq"
        val per = (0 until m.tables).map { sh =>
          val sd = s"$dir/shard=$sh"
          val sm = readMeta(spark, sd, inner)
          // a shard whose corpus dir is GONE (partial delete, failed
          // publish) must fail loudly here — partFileStats maps a
          // missing path to (0, 0), which would understate file decay
          // and let maintain() report "healthy" over a corrupted index
          val cp = new org.apache.hadoop.fs.Path(s"$sd/corpus.parquet")
          require(cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .exists(cp),
            s"stats: shard $sh of $dir has a meta but no corpus table at " +
              s"$cp — the index is damaged; restore the shard before " +
              "trusting any health signal")
          val (f, b) =
            graft.io.Compaction.partFileStats(spark, s"$sd/corpus.parquet")
          (sm.nRows, tombstoneCount(sd), sm.nlist.toLong, f, b, sm.quantized)
        }
        // shard skew is THE rebalance signal: hash routing keeps rows
        // near-even, so a wide min/max spread means the id distribution
        // changed (or a shard missed appends) — reshard territory.
        // n_rows is the SHARD-META sum, not the parent meta: searches run
        // off per-shard metas, so this is the served truth even if a
        // failed parallel append left the parent counter stale
        Seq((kind, m.idCol, per.map(_._1).sum, per.map(_._2).sum, per.map(_._3).sum.toInt,
            m.tables, per.map(_._4).sum, per.map(_._5).sum, per.head._6,
            per.map(_._1).min, per.map(_._1).max))
          .toDF("kind", "id_col", "n_rows", "pending_tombstones",
            "cells_or_tables", "n_shards", "data_files", "data_bytes",
            "quantized", "shard_rows_min", "shard_rows_max")
      case other => throw new IllegalArgumentException(
        s"stats: unknown index kind '$other' at $dir")
    }
  }

  /** Stats-DRIVEN maintenance — the consumer of [[stats]] that closes the
    * loop the observability opened: instead of compacting on a fixed
    * count cadence, read the measured signals and act.
    *
    *   - `pending_tombstones / n_rows > tombstoneRatio` → fold (every
    *     search pays the anti-join until tombstones leave disk)
    *   - `data_files > fileDecay × ideal` → fold, where ideal is what one
    *     [[compact]] would leave: max(cells/tables, bytes/targetFileMB)
    *     (append-littered layouts pay per-file opens, not bytes)
    *   - `shard_rows_max / shard_rows_min > skewRatio` → a LOUD reshard
    *     RECOMMENDATION in the returned report — never an automatic
    *     [[reshardIvf]]/[[reshardIvfPq]]: a topology change re-keys the
    *     layout an operator may be serving, so it stays a deliberate,
    *     visible event (same contract as centroid re-fits).
    *
    * At most ONE fold runs per call regardless of how many signals
    * crossed. Returns the one-row decision report (signals, thresholds
    * implied by `reason`, actions taken/recommended) so a scheduled
    * maintenance lane has an auditable record of why it did or did not
    * act. Under thresholds the call is a pure no-op read. */
  def maintain(
      spark: SparkSession,
      dir: String,
      tombstoneRatio: Double = 0.1,
      fileDecay: Double = 4.0,
      skewRatio: Double = 2.0,
      targetFileMB: Int = 128): DataFrame = {
    import spark.implicits._
    val st = stats(spark, dir).head()
    val kind = st.getAs[String]("kind")
    val nRows = st.getAs[Long]("n_rows")
    val pending = st.getAs[Long]("pending_tombstones")
    val files = st.getAs[Long]("data_files")
    val bytes = st.getAs[Long]("data_bytes")
    val cells = st.getAs[Int]("cells_or_tables")
    val nShards = st.getAs[Int]("n_shards")
    val pendingRatio = if (nRows > 0) pending.toDouble / nRows else 0.0
    val ideal = math.max(math.max(cells.toLong, 1L),
      math.ceil(bytes / (targetFileMB * 1024.0 * 1024.0)).toLong)
    val decay = files.toDouble / ideal
    val skew =
      if (nShards > 1)
        st.getAs[Long]("shard_rows_max").toDouble /
          math.max(st.getAs[Long]("shard_rows_min"), 1L)
      else 1.0
    val compactReasons = Seq(
      if (pendingRatio > tombstoneRatio)
        Some(f"tombstones: $pending/$nRows = $pendingRatio%.4f > $tombstoneRatio%.4f")
      else None,
      if (decay > fileDecay)
        Some(f"file decay: $files files vs ideal $ideal = $decay%.2f× > $fileDecay%.2f×")
      else None).flatten
    if (compactReasons.nonEmpty) compact(spark, dir, targetFileMB)
    val reshardRecommended = nShards > 1 && skew > skewRatio
    val reason = (compactReasons ++
      (if (reshardRecommended)
        Seq(f"RESHARD RECOMMENDED: shard skew $skew%.2f× > $skewRatio%.2f× " +
          "(hash routing drifted or a shard missed appends); pick a shard " +
          "count COPRIME to the current one — skew on hash routing means " +
          "the stored id set is correlated with the hash, and resharding " +
          "to a count sharing a factor preserves that correlation " +
          "(measured: 2->4 left a 20x skew in place, 2->3 rebalanced it " +
          "to ~1x — SCALEBENCH reshard-rehearsal)")
      else Nil)).mkString("; ")
    Seq((kind, nRows, pending, pendingRatio, files, ideal, decay, skew,
        compactReasons.nonEmpty, reshardRecommended,
        if (reason.isEmpty) "healthy: under all thresholds" else reason))
      .toDF("kind", "n_rows", "pending_tombstones", "pending_ratio",
        "data_files", "ideal_files", "file_decay", "shard_skew",
        "compacted", "reshard_recommended", "reason")
  }

  /** Average candidate rows per query an operating point SCANS, replayed
    * from the persisted layout through the same probe-resolution code the
    * searches run ([[shardNprobe]] / [[Similarity.ivfAutoNprobe]] /
    * [[Similarity.lshQuerySide]] — never a re-implementation, so the
    * reported volume cannot drift from what serving actually reads).
    * This is the "what does this nprobe/probes point cost" column of a
    * tuning sweep: probed-cell (or probed-signature-bucket) occupancy
    * summed per query, averaged over queries. Work shape: centroid/
    * signature-key aggregates + the broadcast-sized query probe ranking —
    * the vector payload is never scored. Counts include pending-tombstone
    * rows: the pruned scan still READS them until a [[compact]] folds the
    * set (the anti-join drops them before scoring, not before IO). */
  def candidateVolume(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      queryIdCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 0,
      probes: Int = 0): Double = {
    val nQ = math.max(1L, queries.count())
    def ivfCand(d: String, resolved: Int): Long = {
      val centDf = spark.read.parquet(s"$d/centroids.parquet")
      val occ = spark.read.parquet(s"$d/corpus.parquet")
        .groupBy(col("__cell")).agg(count(lit(1)).as("__occ"))
      val got = Similarity
        .ivfQueryProbes(queries, queryIdCol, vecCol, centDf, resolved)
        .select(col("query_id"), col("__cell"))
        .join(occ, Seq("__cell"))
        .agg(sum(col("__occ"))).head()
      if (got.isNullAt(0)) 0L else got.getLong(0)
    }
    kindOf(spark, dir) match {
      case kind @ ("ivf" | "ivfpq") =>
        val m = readMeta(spark, dir, kind)
        val resolved =
          if (nprobe > 0) nprobe
          else Similarity.ivfAutoNprobe(m.nlist, m.nRows, k)
        ivfCand(dir, resolved).toDouble / nQ
      case kind @ ("ivf_sharded" | "ivfpq_sharded") =>
        val m = readMeta(spark, dir, kind)
        val inner = if (kind == "ivf_sharded") "ivf" else "ivfpq"
        (0 until m.tables).map { sh =>
          val sd = s"$dir/shard=$sh"
          ivfCand(sd, shardNprobe(spark, sd, inner, k, nprobe, m.tables))
        }.sum.toDouble / nQ
      case "lsh" =>
        val m = readMeta(spark, dir, "lsh")
        val qSig = Similarity.lshQuerySide(
          queries, queryIdCol, vecCol, m.tables, m.bits, probes)
        val occ = spark.read.parquet(s"$dir/signatures.parquet")
          .groupBy(col("table"), col("sig")).agg(count(lit(1)).as("__occ"))
        val got = qSig.select(col("query_id"), col("table"), col("sig"))
          .distinct()
          .join(occ, Seq("table", "sig"))
          .agg(sum(col("__occ"))).head()
        (if (got.isNullAt(0)) 0L else got.getLong(0)).toDouble / nQ
      case other => throw new IllegalArgumentException(
        s"candidateVolume: unknown index kind '$other' at $dir")
    }
  }

  // ------------------------------------------------------------------ IVF

  /** Fit the coarse quantizer once and persist centroids + the
    * cell-partitioned corpus. `nlist = 0` auto-scales to ~√N (see
    * [[Similarity.ivfCosineTopK]]). The expensive pieces — the k-means fit
    * and the full-corpus assignment pass — happen HERE, never at search.
    *
    * `attrCols` carries attribute columns (language, source, label, …)
    * into the stored layout verbatim — the metadata-filtering surface:
    * [[searchIvf]]'s `corpusFilter` can then restrict candidates by any
    * predicate over them, pushed into the pruned parquet scan. */
  def buildIvf(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nlist: Int = 0,
      seed: Long = 0L,
      fitSample: Int = 100000,
      quantize: Boolean = false,
      attrCols: Seq[String] = Nil): Unit = {
    require(nlist >= 0, s"nlist must be >= 0 (0 = auto), got $nlist")
    val nRows = corpus.count()
    val cells =
      if (nlist > 0) nlist
      else Similarity.ivfAutoNlist(nRows, Similarity.vecWidth(corpus, vecCol))
    val corpusVec = Similarity.ivfNormalizedCorpus(corpus, idCol, vecCol, attrCols)
    val model = Similarity.ivfFit(corpusVec, idCol, cells, seed, fitSample)
    // compacted write (r21, guide §6): the centroid frame is a local
    // relation whose bare write fans out over defaultParallelism slices —
    // 32 near-empty part files that EVERY search then scans as 32 tasks
    // of pure per-task overhead. The frame is nlist·dims-bounded (the
    // CentroidBudgetDoubles broadcast budget), so the size-derived
    // compaction lands on a handful of files at any legal nlist.
    graft.io.Tables.compactTo(
      Similarity.ivfCentroidFrame(corpus.sparkSession, model),
      s"$dir/centroids.parquet")
    // one partition directory per cell: search prunes to the probed
    // cells. clusterByCell: without it every write task emits a file
    // into every cell it holds rows for — tasks × cells small files
    // from DAY ONE (measured: a fresh 1M-row 16-dim QUANTIZED index
    // outweighed its float64 SOURCE on parquet per-file overhead alone)
    clusterByCell(storedForm(model.transform(corpusVec).drop("__mlvec"), quantize))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__cell")
      .parquet(s"$dir/corpus.parquet")
    writeMeta(corpus.sparkSession, dir,
      Meta("ivf", idCol, nRows, cells, tables = 0, bits = 0, seed, quantize))
  }

  /** Search a prebuilt IVF index: rank the broadcast centroids per query,
    * prune the corpus scan to the probed cell partitions, exact-cosine
    * re-rank. No fit, no full-corpus pass — identical results to
    * [[Similarity.ivfCosineTopK]] at identical parameters. `nprobe = 0`
    * uses the same auto rule as the one-shot operator.
    *
    * `corpusFilter` is the metadata-filtering surface: a predicate over
    * the attribute columns the index was built with (`attrCols`),
    * applied to the pruned scan BEFORE scoring — so "nearest neighbors
    * within this language/source/label" pays only the probed-and-
    * matching bytes (parquet pushes the predicate into the row groups).
    * Post-filter semantics: candidates still come from the probed cells
    * first, so a highly selective filter thins the pool — raise
    * `nprobe` (up to nlist for exact-within-filter) when the filter
    * keeps only a small slice of each cell. */
  def searchIvf(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      queryIdCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 0,
      corpusFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(nprobe >= 0, s"nprobe must be >= 0 (0 = auto), got $nprobe")
    val m = readMeta(spark, dir, "ivf")
    val probes =
      if (nprobe > 0) nprobe else Similarity.ivfAutoNprobe(m.nlist, m.nRows, k)
    require(probes >= 1 && probes <= m.nlist,
      s"need 1 <= nprobe <= nlist, got nprobe=$probes nlist=${m.nlist}")
    val centDf = spark.read.parquet(s"$dir/centroids.parquet")
    // exhaustive operating point (nprobe = nlist — the exact-oracle
    // searches): every cell is probed by construction, so the probe
    // ranking window AND the probed-cell collect job are skipped — the
    // pruning literal would name every partition anyway
    val exhaustive = probes == m.nlist
    val qProbes = Similarity.ivfQueryProbes(
      queries, queryIdCol, vecCol, centDf, probes, allCells = exhaustive)
    val corpusStored = spark.read.parquet(s"$dir/corpus.parquet")
    Similarity.requireComparableIdTypes(
      corpusStored.schema(m.idCol).dataType, s"index corpus id '${m.idCol}' at $dir",
      queries.schema(queryIdCol).dataType, s"query id '$queryIdCol'")
    // the probed-cell set is |Q|·nprobe values (queries are broadcast-sized
    // by contract) — pushed as a literal so hive partition pruning drops
    // unprobed directories before any IO
    val pruned =
      if (exhaustive) corpusStored
      else {
        val probedCells = qProbes.select(col("__cell")).distinct()
          .collect().map(_.getInt(0)).toSeq
        corpusStored.filter(col("__cell").isin(probedCells: _*))
      }
    // tombstoned rows drop AFTER the pruning (candidate-sized anti-join)
    // and BEFORE the dequantize/score tail — deleted ids never score
    val alive = minusTombstones(spark, dir, m.idCol,
      corpusFilter.fold(pruned)(pruned.filter))
    Similarity.ivfScore(scoringForm(alive, m.quantized), qProbes, m.idCol, k)
  }

  // --------------------------------------------------------------- IVF-PQ

  /** IVF with PRODUCT-QUANTIZED residuals-free codes (the FAISS `IVF,PQ`
    * shape without residual encoding): the coarse quantizer partitions
    * the corpus into cells exactly as [[buildIvf]], but each stored row
    * carries only `m` small codebook codes instead of the float vector —
    * the memory/scan-byte scale path when even int8 is too big (d floats
    * → m bytes-ish; 64-dim float32 → 8 codes is ~32×). Scoring is ADC
    * (asymmetric distance computation): per query a lookup table of
    * m·codes subspace dot products is built once, and each candidate
    * costs m array lookups + adds instead of a d-dim dot product. The
    * cosine returned is the quantized approximation — recall is
    * planted-truth-measured (tools/Recall.scala).
    *
    * `refine = true` (the DEFAULT — the 0.5-recall-bound raw-ADC layout
    * is an opt-in, not what a caller gets by accident) additionally
    * stores int8-quantized vectors
    * (`__q` + dequantized norm `__cn`) beside the codes — the FAISS
    * refine pattern (`IVFPQR`-shaped, with an SQ8 refiner instead of a
    * second PQ): search ADC-shortlists cheaply, then re-ranks the
    * shortlist against the int8 reconstruction, recovering most of the
    * recall PQ loses while the scan bytes stay dominated by the m-byte
    * codes (the int8 column is touched only for shortlisted rows when
    * parquet late materialization applies, and is still 4-8× smaller
    * than float64). Without refine the layout is codes-only — the
    * absolute minimum bytes.
    *
    * Meta mapping for this kind: `nlist` = coarse cells, `tables` = m
    * subspaces, `bits` = effective codebook size per subspace;
    * `quantized = true` iff the refine vectors are stored. */
  def buildIvfPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nlist: Int = 0,
      m: Int = 8,
      codes: Int = 256,
      seed: Long = 0L,
      fitSample: Int = 100000,
      attrCols: Seq[String] = Nil,
      refine: Boolean = true): Unit = {
    require(nlist >= 0, s"nlist must be >= 0 (0 = auto), got $nlist")
    require(m > 0 && codes > 1, s"need m > 0 subspaces and codes > 1, got m=$m codes=$codes")
    val nRows = corpus.count()
    val cells =
      if (nlist > 0) nlist
      else Similarity.ivfAutoNlist(nRows, Similarity.vecWidth(corpus, vecCol))
    val corpusVec = Similarity.ivfNormalizedCorpus(corpus, idCol, vecCol, attrCols)
    val model = Similarity.ivfFit(corpusVec, idCol, cells, seed, fitSample)
    // compacted writes (r21, guide §6) — same rationale as buildIvf: both
    // frames are broadcast-budget-bounded local relations whose bare
    // writes left ~32 near-empty part files for every search to scan
    graft.io.Tables.compactTo(
      Similarity.ivfCentroidFrame(corpus.sparkSession, model),
      s"$dir/centroids.parquet")
    val (books, codesEff) = Similarity.pqFit(corpusVec, idCol, m, codes, seed, fitSample)
    graft.io.Tables.compactTo(books, s"$dir/codebooks.parquet")
    val assigned = model.transform(corpusVec).drop("__mlvec")
    // codes + reconstruction norm in the same map-only pass as the cell
    // assignment — no explode/join/aggregate round trip (r18)
    val keepCols =
      if (refine) col(idCol) +: col("__cell") +: col("__q") +: col("__cn") +:
        attrCols.map(col)
      else col(idCol) +: col("__cell") +: attrCols.map(col)
    clusterByCell(Similarity.pqEncodeColumns(assigned, books)
        .transform(d => if (refine) storedForm(d, quantize = true) else d)
        .select(keepCols ++ Seq(col("__codes"), col("__rn")): _*))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__cell")
      .parquet(s"$dir/corpus.parquet")
    writeMeta(corpus.sparkSession, dir,
      Meta("ivfpq", idCol, nRows, cells, tables = m, bits = codesEff, seed,
        quantized = refine))
  }

  /** Search a prebuilt IVF-PQ index: probe cells like [[searchIvf]], then
    * ADC-score the pruned candidates against the per-query lookup table.
    * `corpusFilter` filters on stored attribute columns exactly as in
    * [[searchIvf]].
    *
    * `refine > 0` re-ranks: ADC keeps the top `refine·k` per query (the
    * shortlist), then the shortlist alone is re-scored against the
    * stored int8 vectors (requires an index built with `refine = true`)
    * and cut to k. ADC mis-rankings inside the shortlist are repaired at
    * the cost of `refine·k` int8 dot products per query — candidate
    * GENERATION still pays only m lookup-adds per row, so the scan cost
    * is unchanged; only the tail narrows differently. `refine = 0`
    * returns the raw ADC ranking (`cosine` is the PQ approximation;
    * recall ~0.66 on the planted-truth harness vs ~0.92 refined — pick
    * it deliberately); refined results report the int8-reconstruction
    * cosine. The DEFAULT `refine = -1` is auto: re-rank a 10·k shortlist
    * when the index stores refine vectors, raw ADC only when it is
    * codes-only — a caller on defaults never silently lands on the
    * worst-recall operating point of the suite. */
  def searchIvfPq(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      queryIdCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 0,
      corpusFilter: Option[org.apache.spark.sql.Column] = None,
      refine: Int = -1): DataFrame = {
    require(nprobe >= 0, s"nprobe must be >= 0 (0 = auto), got $nprobe")
    require(refine >= -1, s"refine must be >= -1 (-1 = auto, 0 = off), got $refine")
    val m = readMeta(spark, dir, "ivfpq")
    val probes =
      if (nprobe > 0) nprobe else Similarity.ivfAutoNprobe(m.nlist, m.nRows, k)
    require(probes >= 1 && probes <= m.nlist,
      s"need 1 <= nprobe <= nlist, got nprobe=$probes nlist=${m.nlist}")
    // AUTO refine scales with the ADC candidate volume: PQ rank noise
    // displaces true neighbors deeper in the ADC ordering as the scored
    // pool grows, so a CONSTANT shortlist silently starves at scale —
    // the r19 pq-sharded-decade probe measured recall 0.796 at the old
    // fixed factor 10 (36k candidates/shard/query) vs 0.912 at 40 with
    // the same probes; shortlist ≈ candidates/64 tracks that operating
    // point across scales (int8 re-rank cost stays ~1.6% of the ADC
    // rows), clamped to [10, 100] so small corpora keep the calibrated
    // floor and the re-rank stays bounded.
    val refineEff =
      if (refine >= 0) refine
      else if (!m.quantized) 0
      else {
        val candEst = probes.toDouble * m.nRows / math.max(m.nlist, 1)
        math.min(100L, math.max(10L,
          math.ceil(candEst / (64.0 * k)).toLong)).toInt
      }
    val centDf = spark.read.parquet(s"$dir/centroids.parquet")
    val books = spark.read.parquet(s"$dir/codebooks.parquet")
    // exhaustive operating point: skip the probe ranking window and the
    // probed-cell collect job — the literal would name every cell (same
    // fast path as searchIvf)
    val exhaustive = probes == m.nlist
    val qProbes = Similarity.ivfQueryProbes(
        queries, queryIdCol, vecCol, centDf, probes, allCells = exhaustive)
      .select(col("query_id"), col("__cell"))
    // the PqLutArray kernel reads each subspace's width off its own
    // centroids, so the r20 driver-side codebook width probe is gone too
    val lut = broadcast(
      Similarity.pqLut(queries, queryIdCol, vecCol, books, m.bits))
    val corpusStored = spark.read.parquet(s"$dir/corpus.parquet")
    Similarity.requireComparableIdTypes(
      corpusStored.schema(m.idCol).dataType, s"index corpus id '${m.idCol}' at $dir",
      queries.schema(queryIdCol).dataType, s"query id '$queryIdCol'")
    val pruned =
      if (exhaustive) corpusStored
      else {
        val probedCells = qProbes.select(col("__cell")).distinct()
          .collect().map(_.getInt(0)).toSeq
        corpusStored.filter(col("__cell").isin(probedCells: _*))
      }
    // tombstoned rows drop after pruning, before any ADC work
    val filtered = minusTombstones(spark, dir, m.idCol,
      corpusFilter.fold(pruned)(pruned.filter))
    val adcCosine = {
      // Σ lut = q·x̂; divide by the stored ‖x̂‖ → cos(q, x̂). The codegen'd
      // AdcDot kernel replaced the r17 aggregate∘zip_with formulation,
      // which allocated a sequence array and folded interpreted lambdas
      // PER CANDIDATE ROW on the hottest loop a PQ search has (measured
      // 2.6× min-of-3 on a materialized 1M-candidate scoring scan at
      // m=8 — the scan-bound floor; the kernel term alone shrinks more)
      import org.apache.spark.sql.graft.Bridge
      Bridge.column(graft.expressions.AdcDot(
        Bridge.expression(col("__codes")),
        Bridge.expression(col("__lut")),
        Bridge.expression(lit(m.bits)))) / col("__rn")
    }
    val scored = filtered
      // query probes are broadcast-small at the join site (same contract
      // as ivfScore — ivfQueryProbes leaves hinting to its consumers)
      .join(broadcast(qProbes), Seq("__cell"))
      .join(lut, Seq("query_id"))
      .filter(col(m.idCol) =!= col("query_id"))
      .filter(col("__rn") > 0)
    if (refineEff == 0) {
      Similarity.rankTopK(
        scored.select(col("query_id"), col(m.idCol),
          round(adcCosine, 6).as("cosine")),
        m.idCol, k)
    } else {
      require(corpusStored.columns.contains("__q"),
        s"index at $dir stores no refine vectors — rebuild with " +
          "buildIvfPq(..., refine = true) to re-rank, or pass refine = 0")
      // ADC shortlist: refine·k per query, UNROUNDED scores (the rounding
      // that stabilizes reported output would create shortlist-boundary
      // ties here). The shortlist keeps the stored int8 payload columns.
      val shortlist = Similarity
        .rankTopK(scored.select(col("query_id"), col(m.idCol),
            adcCosine.as("cosine"), col("__q"), col("__cn")),
          m.idCol, refineEff * k, extraCols = Seq("__q", "__cn"))
      // int8 re-rank: cos(q, dq(x)) over shortlisted rows only — the
      // query side is the broadcast-sized unit-vector frame
      val qUnit = broadcast(queries
        .select(col(queryIdCol).as("query_id"),
          col(vecCol).cast("array<double>").as("__qv"))
        .withColumn("__qn", Similarity.l2Norm(col("__qv")))
        .filter(col("__qn") > 0))
      val refined = shortlist
        .join(qUnit, Seq("query_id"))
        .select(col("query_id"), col(m.idCol),
          round(
            Similarity.dot(Similarity.dequantizeInt8(col("__q")), col("__qv")) /
              (col("__cn") * col("__qn")), 6).as("cosine"))
      Similarity.rankTopK(refined, m.idCol, k)
    }
  }

  /** Map-only nearest-persisted-centroid assignment — the shared kernel
    * of the APPEND paths ([[appendIvf]]/[[appendIvfPq]]): the centroid
    * table is folded into ONE broadcast row (every cell, cell-ascending,
    * ‖cent‖² precomputed) and each batch row picks its cell with the
    * codegen'd [[graft.expressions.NearestCell]] argmin — the exact
    * all-cells argmin with the same tie-break (smallest cell id) the
    * previous formulation computed. That formulation was crossJoin +
    * row_number window: O(|batch|·nlist) rows THROUGH A SHUFFLE — a
    * 1M-row daily append at production nlist (4472 auto cells at 20M
    * rows, 65536 at the cap) pushed 4.5–65 billion intermediate rows
    * through an exchange (r17 verdict's one `weak`). This shape is
    * |batch| rows end to end: the single candidates row is broadcast
    * (nlist·dims doubles — bounded by
    * [[Similarity.CentroidBudgetDoubles]], the same budget the
    * search-side probe ranking already imposes on the same bytes), the
    * nested-loop join against one row is map-only, and the argmin loop
    * runs inside whole-stage codegen. Build-path symmetry: the build's
    * flat quantizer is this same exact argmin; its two-level variant
    * (√cells supers) economizes the FULL-CORPUS pass — a batch-sized
    * append keeps the exact flat argmin, trading nlist·dims multiplies
    * per row (identical arithmetic to the old crossJoin) for zero
    * shuffle. Plan pinned shuffle-free in AnnIndexSpec. */
  private[graft] def assignToPersistedCells(
      corpusVec: DataFrame, centDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val cands = centDf
      .select(struct(col("__cell"),
        col("__cent").cast("array<double>").as("__cent"),
        Similarity.dot(col("__cent"), col("__cent")).as("__c2")).as("__c"))
      .agg(array_sort(collect_list(col("__c"))).as("__cands"))
    corpusVec
      .drop("__mlvec")
      .crossJoin(broadcast(cands))
      .withColumn("__cell", Bridge.column(graft.expressions.NearestCell(
        Bridge.expression(col("__cv").cast("array<double>")),
        Bridge.expression(col("__cn")),
        Bridge.expression(col("__cands")))))
      .drop("__cands")
  }

  /** Append a new corpus batch to a prebuilt IVF-PQ index: cells assigned
    * against the PERSISTED centroids (map-only —
    * [[assignToPersistedCells]]), codes against the PERSISTED codebooks —
    * batch-sized work, no re-fit (a re-fit is an explicit rebuild, same
    * contract as [[appendIvf]]/[[appendLsh]]). */
  def appendIvfPq(
      batch: DataFrame,
      vecCol: String,
      dir: String): Unit = {
    val spark = batch.sparkSession
    val m = readMeta(spark, dir, "ivfpq")
    requireNoTombstoneCollisions(spark, dir, m.idCol, batch)
    val centDf = spark.read.parquet(s"$dir/centroids.parquet")
    val books = spark.read.parquet(s"$dir/codebooks.parquet")
    val storedCols = spark.read.parquet(s"$dir/corpus.parquet").columns.toSet
    val hasRefine = storedCols.contains("__q")
    val attrs = (storedCols
      -- Set(m.idCol, "__codes", "__rn", "__cell", "__q", "__cn")).toSeq.sorted
    val corpusVec = Similarity.ivfNormalizedCorpus(batch, m.idCol, vecCol, attrs)
    val assigned = assignToPersistedCells(corpusVec, centDf)
      .select((Seq(m.idCol, "__cv", "__cn") ++ attrs :+ "__cell").map(col): _*)
    // assignment AND encoding are both map-only now — the whole PQ
    // append is shuffle-free on the batch side except the final
    // clusterByCell layout repartition (r18; r17 shipped an explode +
    // join + two corpus×m aggregations here)
    val keepCols =
      if (hasRefine) col(m.idCol) +: col("__cell") +: col("__q") +: col("__cn") +:
        attrs.map(col)
      else col(m.idCol) +: col("__cell") +: attrs.map(col)
    clusterByCell(Similarity.pqEncodeColumns(assigned, books)
        .transform(d => if (hasRefine) storedForm(d, quantize = true) else d)
        .select(keepCols ++ Seq(col("__codes"), col("__rn")): _*))
      .write.mode(SaveMode.Append)
      .partitionBy("__cell")
      .parquet(s"$dir/corpus.parquet")
    writeMeta(spark, dir, m.copy(nRows = m.nRows + batch.count()))
  }

  /** IVF-PQ twin of [[ensureIvf]]. */
  def ensureIvfPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nlist: Int = 0,
      m: Int = 8,
      codes: Int = 256,
      seed: Long = 0L,
      refine: Boolean = true): Unit =
    if (!exists(corpus.sparkSession, dir))
      buildIvfPq(corpus, idCol, vecCol, dir, nlist, m, codes, seed,
        refine = refine)

  // ------------------------------------------------------------------ LSH

  /** Sign the corpus once and persist the (table, sig)-addressed layout.
    * `bits = 0` auto-scales signature width to constant expected bucket
    * population (see [[Similarity.lshCosineTopK]]). LSH needs no fitting —
    * the planes are hash-derived — so "build" is exactly the corpus
    * signing pass the one-shot operator repeats per call. */
  /** LSH signature rows store the vector once PER TABLE replica, so int8
    * quantization's 4-8× byte cut multiplies by `tables` — the norm is
    * recomputed on the dequantized codes like the IVF path, keeping
    * cosine arithmetic consistent with what search reconstructs. */
  private def lshStoredForm(side: DataFrame, quantize: Boolean): DataFrame =
    if (!quantize) side
    else side
      .withColumn("__q", Similarity.quantizeInt8(col("__cv")))
      .withColumn("__cv_n", Similarity.l2Norm(Similarity.dequantizeInt8(col("__q"))))
      .drop("__cv")

  private def lshScoringForm(stored: DataFrame, quantized: Boolean): DataFrame =
    if (!quantized) stored
    else stored
      .withColumn("__cv", Similarity.dequantizeInt8(col("__q")))
      .drop("__q")

  def buildLsh(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      tables: Int = 8,
      bits: Int = 0,
      k: Int = 16,
      attrCols: Seq[String] = Nil,
      quantize: Boolean = false): Unit = {
    require(bits >= 0, s"bits must be >= 0 (0 = auto), got $bits")
    val nRows = corpus.count()
    val sigBits = if (bits > 0) bits else Similarity.lshAutoBits(nRows, k)
    // sig-sorted within each table partition: parquet row-group min/max
    // stats become the bucket index (search pushes `sig IN (...)`)
    lshStoredForm(
        Similarity.lshSide(corpus, idCol, vecCol, "__cv", tables, sigBits, attrCols),
        quantize)
      .repartition(col("table"))
      .sortWithinPartitions(col("table"), col("sig"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("table")
      .parquet(s"$dir/signatures.parquet")
    writeMeta(corpus.sparkSession, dir,
      Meta("lsh", idCol, nRows, nlist = 0, tables, sigBits, seed = 0L,
        quantized = quantize))
  }

  /** Search a prebuilt LSH index: sign the queries (with optional
    * Hamming-1 multi-probe), push the probed signature set into the
    * corpus scan, bucket-join + exact-cosine re-rank. Identical results
    * to [[Similarity.lshCosineTopK]] at identical parameters.
    *
    * `corpusFilter` mirrors [[searchIvf]]: a predicate over the
    * attribute columns the index was built with (`attrCols`), applied
    * to the signature scan before the bucket join. Candidates still
    * come from the probed buckets, so a highly selective filter thins
    * the pool — raise `probes` or `tables` when the filter keeps only
    * a small slice of each bucket. */
  def searchLsh(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      queryIdCol: String,
      vecCol: String,
      k: Int,
      probes: Int = 0,
      corpusFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val m = readMeta(spark, dir, "lsh")
    val qSig =
      Similarity.lshQuerySide(queries, queryIdCol, vecCol, m.tables, m.bits, probes)
    val sigStored = spark.read.parquet(s"$dir/signatures.parquet")
    Similarity.requireComparableIdTypes(
      sigStored.schema(m.idCol).dataType, s"index corpus id '${m.idCol}' at $dir",
      queries.schema(queryIdCol).dataType, s"query id '$queryIdCol'")
    // exhaustive operating point (r21, the searchIvf allCells mirror):
    // when ANY query's Hamming-1 probe set covers the whole 2^bits
    // signature space — base sig + min(probes, bits) flips ≥ 2^bits,
    // i.e. the bits ≤ 1 exact-twin configurations — the pruning literal
    // would name every bucket, so the probed-signature collect job is
    // skipped outright. At every other operating point the bounded
    // literal (|Q|·tables·(1+probes) values) stays DELIBERATELY: pushed
    // to parquet it row-group-skips the sig-sorted files (PushedFilters
    // sig IN (...)), which a broadcast semi-join cannot do — the scan
    // pruning is worth one driver-side bounded collect at any scale.
    val exhaustive =
      (1L << m.bits) <= 1L + math.min(math.max(probes, 0), m.bits)
    val pruned =
      if (exhaustive) sigStored
      else {
        val probedSigs = qSig.select(col("sig")).distinct()
          .collect().map(_.getLong(0)).toSeq
        sigStored.filter(col("sig").isin(probedSigs: _*))
      }
    // tombstoned rows drop after the signature pruning, before scoring
    val alive = minusTombstones(spark, dir, m.idCol,
      corpusFilter.fold(pruned)(pruned.filter))
    Similarity.lshScore(lshScoringForm(alive, m.quantized), qSig, m.idCol, k)
  }

  // -------------------------------------------------- incremental append

  /** The id column a persisted index was built with — for callers
    * composing batch flows against the index (cf.
    * [[graft.dedup.MinHashIndex.idColumn]]). */
  def idColumn(spark: SparkSession, dir: String, kind: String = "ivf"): String =
    readMeta(spark, dir, kind).idCol

  /** Append a new corpus batch to a prebuilt IVF index: assign each batch
    * vector to its nearest PERSISTED centroid (map-only —
    * [[assignToPersistedCells]]; the batch is never collected, the
    * centroids ride one broadcast row) and append to the cell-partitioned
    * layout. The steady-state curation shape: a day's batch costs one
    * batch-sized pass, never a corpus re-fit. Centroids drift as data
    * drifts — re-fit is an explicit [[buildIvf]] rebuild, a deliberate
    * visible event, not a silent degradation. */
  def appendIvf(
      batch: DataFrame,
      vecCol: String,
      dir: String): Unit = {
    val spark = batch.sparkSession
    val m = readMeta(spark, dir, "ivf")
    requireNoTombstoneCollisions(spark, dir, m.idCol, batch)
    val centDf = spark.read.parquet(s"$dir/centroids.parquet")
    // attribute columns ride along exactly as the index stores them —
    // recovered from the stored schema, so appends need no attr config
    val attrs = (spark.read.parquet(s"$dir/corpus.parquet").columns.toSet
      -- Set(m.idCol, "__cv", "__q", "__cn", "__cell")).toSeq.sorted
    val corpusVec = Similarity.ivfNormalizedCorpus(batch, m.idCol, vecCol, attrs)
    assignToPersistedCells(corpusVec, centDf)
      .select((Seq(m.idCol, "__cv", "__cn") ++ attrs :+ "__cell").map(col): _*)
      .transform(storedForm(_, m.quantized))
      .transform(clusterByCell)
      .write.mode(SaveMode.Append)
      .partitionBy("__cell")
      .parquet(s"$dir/corpus.parquet")
    writeMeta(spark, dir, m.copy(nRows = m.nRows + batch.count()))
  }

  /** Append a new corpus batch to a prebuilt LSH index: sign the batch
    * under the SAME persisted (tables, bits) — the planes are
    * hash-derived, so old and new rows share one bucket space by
    * construction — and append to the table-partitioned layout. */
  def appendLsh(
      batch: DataFrame,
      vecCol: String,
      dir: String): Unit = {
    val spark = batch.sparkSession
    val m = readMeta(spark, dir, "lsh")
    requireNoTombstoneCollisions(spark, dir, m.idCol, batch)
    // attribute columns ride along exactly as the index stores them —
    // recovered from the stored schema, so appends need no attr config
    val attrs = (spark.read.parquet(s"$dir/signatures.parquet").columns.toSet
      -- Set(m.idCol, "__cv", "__cv_n", "__q", "table", "sig")).toSeq.sorted
    lshStoredForm(
        Similarity.lshSide(batch, m.idCol, vecCol, "__cv", m.tables, m.bits, attrs),
        m.quantized)
      .repartition(col("table"))
      .sortWithinPartitions(col("table"), col("sig"))
      .write.mode(SaveMode.Append)
      .partitionBy("table")
      .parquet(s"$dir/signatures.parquet")
    writeMeta(spark, dir, m.copy(nRows = m.nRows + batch.count()))
  }

  // ------------------------------------------- build-if-absent convenience

  /** Build the IVF index iff no complete index exists at `dir` (meta is
    * written last, so a crashed build rebuilds). The steady-state call
    * pattern of a serving pipeline: first caller pays the fit, everyone
    * after searches the persisted structure. */
  def ensureIvf(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nlist: Int = 0,
      seed: Long = 0L,
      attrCols: Seq[String] = Nil): Unit =
    if (!exists(corpus.sparkSession, dir))
      buildIvf(corpus, idCol, vecCol, dir, nlist, seed, attrCols = attrCols)

  // ---------------------------------------------------------- sharded IVF

  /** Hash-sharded IVF index: `nShards` independent [[buildIvf]] indexes
    * under `dir/shard=<i>`, each over the `pmod(xxhash64(id), nShards)`
    * slice of the corpus, plus a top-level meta (kind `ivf_sharded`,
    * written LAST — the crashed-build contract composes). First-class
    * sharding removes the two ceilings a single index carries at
    * extreme N (r16 verdict):
    *
    *  - CELLS: each shard auto-fits ~√(N/S) cells over its slice, so the
    *    per-probe-pass broadcast centroid frame stays inside
    *    [[Similarity.CentroidBudgetDoubles]] while TOTAL cells grow to
    *    S·65536 — the documented path past the 65536-cell cap.
    *  - FIT WALL-TIME at cluster scale: the S builds are independent
    *    jobs over disjoint 1/S slices (`buildParallelism` threads submit
    *    them concurrently; Spark schedules fairly across executors), so
    *    with executors to spare they run side by side. On a FIXED
    *    single machine the build is measured ~1.4× the single index
    *    (SCALEBENCH r17) — total work is conserved and every phase
    *    already saturates the cores; shard for the ceiling and for
    *    cluster scale-out, not for local wall-time.
    *
    * The build is TWO-PASS: one corpus scan hash-partitions the rows
    * into `.staging_slices/__shard=<i>` directories, then each shard's
    * [[buildIvf]] reads ONLY its partition-pruned slice. Without the
    * staging pass each of the S builds re-scans the full corpus behind
    * a hash filter — S full scans, measured SLOWER than the single
    * build at 20M rows locally and catastrophically wrong at 100 TB;
    * with it, total corpus bytes read stay ~2× the corpus at any S.
    * The staging slices are deleted after the last shard publishes.
    *
    * Search-identity contract: each per-query global top-k element lives
    * in exactly one shard and necessarily ranks in THAT shard's top-k of
    * the candidates it verified — so the bounded-heap merge of per-shard
    * top-ks equals a single search over the union of the shards'
    * candidate pools. At `nprobe = per-shard nlist` (exhaustive probing)
    * every shard is exact and the merged result IS the exact top-k
    * (AnnIndexSpec pins sharded ≡ brute force there); at auto params the
    * recall story is the per-shard auto policy's, measured in
    * tools/Recall. */
  def buildIvfSharded(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nShards: Int,
      nlist: Int = 0,
      seed: Long = 0L,
      fitSample: Int = 100000,
      quantize: Boolean = false,
      attrCols: Seq[String] = Nil,
      buildParallelism: Int = 4): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(buildParallelism >= 1,
      s"buildParallelism must be >= 1, got $buildParallelism")
    shardedBuild(corpus, idCol, dir, nShards, buildParallelism) {
      (slice, out, sh) =>
        // distinct seed per shard: identically-seeded fits on near-iid
        // slices would land on near-identical centroids — harmless for
        // correctness but wasteful of the diversity S fits can buy
        buildIvf(slice, idCol, vecCol, out, nlist, seed + sh, fitSample,
          quantize, attrCols)
    }
    val spark = corpus.sparkSession
    val total = (0 until nShards)
      .map(sh => readMeta(spark, s"$dir/shard=$sh", "ivf").nRows).sum
    writeMeta(spark, dir,
      Meta("ivf_sharded", idCol, total, nlist, tables = nShards, bits = 0,
        seed, quantize))
  }

  /** The shared sharded-build core: stage the corpus ONCE into
    * hash-partitioned slice directories (pass 1), run `buildOne` per
    * slice on `buildParallelism` concurrent threads against the
    * partition-pruned reads (pass 2), delete the staging slices. The
    * __shard filter is a PARTITION filter — each build scans only its
    * slice bytes, keeping total corpus reads ~2× at any S. */
  private def shardedBuild(
      corpus: DataFrame, idCol: String, dir: String, nShards: Int,
      buildParallelism: Int)(
      buildOne: (DataFrame, String, Int) => Unit): Unit = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(buildParallelism >= 1,
      s"buildParallelism must be >= 1, got $buildParallelism")
    val spark = corpus.sparkSession
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val staged = s"$dir/.staging_slices"
    corpus.withColumn("__shard", shardOf(col(idCol), nShards))
      .write.mode(SaveMode.Overwrite).partitionBy("__shard").parquet(staged)
    val slices = spark.read.parquet(staged)
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(nShards, buildParallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      (0 until nShards).map { sh =>
        Future(buildOne(
          slices.filter(col("__shard") === sh).drop("__shard"),
          s"$dir/shard=$sh", sh))
      }.foreach(Await.result(_, Duration.Inf))
    } finally {
      pool.shutdown()
      val p = new org.apache.hadoop.fs.Path(staged)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
  }

  /** Bounded-heap merge of per-shard top-k frames: |Q|·S·k rows through
    * ONE aggregate, the same (cosine desc, id asc) order every ranked
    * search uses — no window, no global sort. */
  private def mergeShardTopK(
      perShard: Seq[DataFrame], idCol: String, k: Int): DataFrame =
    graft.dp.TopK
      .topKPerKeyDirectional(
        perShard.map(_.drop("rank")).reduce(_.unionByName(_)),
        Seq("query_id"), Seq("cosine" -> false, idCol -> true), k)
      .select(col("query_id"), col(idCol), col("cosine"), col("rank"))

  /** The shard a row's id routes to — one place owns the rule so builds,
    * appends, and any external partitioner agree. Null ids route
    * CONSISTENTLY via the seed hash: Spark's xxhash64 is non-nullable (a
    * null input hashes to the seed, 42), so a null id lands on
    * `pmod(42, nShards)` in builds and appends alike — never in a
    * default-partition directory no slice reads. The coalesce is a
    * belt-and-suspenders guard for any future hash whose null output IS
    * null; with the builtin it never fires (r17 ADVICE: the comment
    * previously claimed shard-0 routing, which was wrong). */
  private def shardOf(id: org.apache.spark.sql.Column, nShards: Int) =
    pmod(coalesce(xxhash64(id), lit(0L)), lit(nShards.toLong)).cast("int")

  /** Search a sharded IVF index: fan the (broadcast-sized) query frame
    * across every shard's [[searchIvf]] — each prunes to its own probed
    * cell partitions, so total bytes touched stay ~nprobe/nlist of each
    * shard — and merge the per-shard top-ks per query on the bounded
    * heap ([[graft.dp.TopK]]: |Q|·S·k rows, one aggregate, no window).
    * `nprobe`/`corpusFilter` pass through to every shard. The per-shard
    * probe RESOLUTION (each shard's centroid ranking collects its
    * probed-cell set to push the partition-pruning literal) runs on S
    * concurrent threads — serially it was S driver round-trips of
    * latency; the scoring itself is one unioned Spark job either way. */
  def searchIvfSharded(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      queryIdCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 0,
      corpusFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val m = readMeta(spark, dir, "ivf_sharded")
    mergeShardTopK(
      fanOut(m.tables)(sh =>
        searchIvf(spark, s"$dir/shard=$sh", queries, queryIdCol, vecCol, k,
          shardNprobe(spark, s"$dir/shard=$sh", "ivf", k, nprobe, m.tables),
          corpusFilter)),
      m.idCol, k)
  }

  /** Per-shard probe resolution for the SHARDED searches: explicit
    * `nprobe` passes through untouched; auto (0) resolves to
    * [[Similarity.shardedProbeCompensation]](S) × the single-index auto
    * policy, capped at the shard's cell count.
    *
    * Why shards need more probes than a same-shape single index: the
    * r19 pq-sharded-decade sweep (20M rows, 4 shards, 2236 cells/shard,
    * clustered shape, exact truth) measured the single-index scale floor
    * (8 probes) covering only **0.78** of true neighbors through the
    * sharded layout — vs 0.892 for the single 20M index under the same
    * policy — while the int8 ceiling sat at 0.99: the loss is coarse
    * COVERAGE, not quantization. Each shard's cells hold the same
    * natural clusters at 1/S the occupancy, so the query's neighborhood
    * sits deeper in each shard's noisier centroid ranking, and the merge
    * needs EVERY shard to cover its slice. Doubling the per-shard floor
    * measured 0.912 at refine 40 (3× → 0.95, plateau 0.962) at S=4 —
    * and the r20 `shard-sweep` then measured the SAME constant starving
    * at higher shard counts (recall 0.814 at S=16, gate fired), so the
    * multiplier now ramps with S (see
    * [[Similarity.shardedProbeCompensation]] for the measured curve);
    * with the volume-scaled auto refine the deployed config re-gates
    * ≥ 0.85 at S = 4/8/16 at 20M and across the 20M→40M decade. */
  private[graft] def shardNprobe(
      spark: SparkSession, shardDir: String, innerKind: String,
      k: Int, nprobe: Int, nShards: Int): Int =
    if (nprobe > 0) nprobe
    else {
      val sm = readMeta(spark, shardDir, innerKind)
      math.min(sm.nlist,
        Similarity.shardedProbeCompensation(nShards) *
          Similarity.ivfAutoNprobe(sm.nlist, sm.nRows, k))
    }

  /** Run one search-plan construction per shard on concurrent threads
    * (each shard's probe resolution collects its probed-cell set — a
    * driver round-trip serially; the scoring itself is one unioned
    * Spark job either way). */
  private def fanOut(nShards: Int)(one: Int => DataFrame): Seq[DataFrame] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(nShards, 8))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try (0 until nShards).map(sh => Future(one(sh)))
      .map(Await.result(_, Duration.Inf))
    finally pool.shutdown()
  }

  /** Append a batch to a sharded IVF index: each row routes to the SAME
    * `pmod(xxhash64(id), nShards)` shard the build used and rides that
    * shard's [[appendIvf]] (assigned against the shard's persisted
    * centroids, appended to its cell partitions). The top-level row
    * count is refreshed last. */
  def appendIvfSharded(
      batch: DataFrame,
      vecCol: String,
      dir: String): Unit =
    shardedAppend(batch, dir, "ivf_sharded")(appendIvf(_, vecCol, _))

  /** The shared sharded-append core: materialize the batch ONCE with its
    * shard routing (a naive per-shard filter + isEmpty + final count re-
    * ran the batch's lineage 2S+1 times — inside a streaming foreachBatch
    * that recomputes the micro-batch from source every action), learn the
    * per-shard counts in one aggregate, then run each non-empty shard's
    * append against the cached frame. */
  private def shardedAppend(
      batch: DataFrame, dir: String, expectKind: String)(
      appendOne: (DataFrame, String) => Unit): Unit = {
    val spark = batch.sparkSession
    val m = readMeta(spark, dir, expectKind)
    val routed = batch.withColumn("__shard", shardOf(col(m.idCol), m.tables))
      .persist()
    try {
      val counts = routed.groupBy(col("__shard")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // tombstone-collision refusal runs for the WHOLE batch BEFORE any
      // shard commits: the per-shard guard inside the appends would fire
      // only after sibling shards already landed their rows, and the
      // error's repair advice (fold, then re-append) would then duplicate
      // the committed siblings. Serial and cheap — a file-existence check
      // per shard, the semi-join only where tombstones pend.
      counts.keys.toSeq.sorted.foreach { sh =>
        requireNoTombstoneCollisions(spark, s"$dir/shard=$sh", m.idCol,
          routed.filter(col("__shard") === sh))
      }
      // the per-shard appends are independent jobs over disjoint
      // directories (reads from the cached routed frame, writes into
      // shard=<i>) — submit them on concurrent threads like the sharded
      // build/search fan-outs; serially each shard paid its own driver
      // round-trips of planning + commit latency (r18)
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val shards = counts.keys.toSeq.sorted
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(math.max(shards.size, 1), 8))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val failures =
        try {
          // await EVERY future before propagating any failure: an early
          // throw would hit the outer finally and unpersist `routed`
          // while sibling appends still read it — recomputing the batch
          // lineage (inside streaming foreachBatch, from a source that
          // has moved on). The pool must be fully quiesced before the
          // cache is released.
          val fs = shards.map(sh => Future(appendOne(
            routed.filter(col("__shard") === sh).drop("__shard"),
            s"$dir/shard=$sh")))
          fs.flatMap(f =>
            scala.util.Try(Await.result(f, Duration.Inf)).failed.toOption)
        } finally {
          pool.shutdown()
          pool.awaitTermination(Long.MaxValue, java.util.concurrent.TimeUnit.SECONDS)
        }
      // the parent row count is DERIVED from the per-shard metas (a
      // listing-sized read, never a data scan), not a running sum: shards
      // that committed before a sibling failed are counted, so the
      // top-level accounting self-heals instead of silently undercounting
      // rows the per-shard metas already carry. Written even on failure —
      // that IS the reconciliation.
      val innerKind = if (expectKind == "ivf_sharded") "ivf" else "ivfpq"
      val reconciled = scala.util.Try {
        val total = (0 until m.tables)
          .map(sh => readMeta(spark, s"$dir/shard=$sh", innerKind).nRows).sum
        writeMeta(spark, dir, m.copy(nRows = total))
      }
      failures match {
        case first +: rest =>
          // the append failure is the story; an unreadable shard meta
          // during reconciliation (plausibly the same broken shard) rides
          // along suppressed. The next successful append or stats() call
          // re-derives the count from the same shard-meta truth.
          rest.foreach(first.addSuppressed)
          reconciled.failed.foreach(first.addSuppressed)
          throw first
        case _ => reconciled.get
      }
    } finally routed.unpersist()
  }

  /** Hash-sharded IVF-PQ index — the minimal-bytes serving layout under
    * the same sharding contract as [[buildIvfSharded]]: staged slices,
    * S parallel [[buildIvfPq]] builds (per-shard codebooks AND coarse
    * cells — each shard is a complete, independently-refittable index),
    * top-level meta (kind `ivfpq_sharded`, `tables` = shard count;
    * per-shard m/codes live in the shard metas) written last. The
    * int8 refine payload is PER-VECTOR (scale = max|x|/127 — codebook-
    * and fit-independent), so at exhaustive probes with a
    * shortlist-covering refine factor the sharded refined search equals
    * the single index's int8-exact answer bit for bit, which is what
    * keeps the sharded PQ layout fully oracle-able. */
  def buildIvfPqSharded(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nShards: Int,
      nlist: Int = 0,
      m: Int = 8,
      codes: Int = 256,
      seed: Long = 0L,
      fitSample: Int = 100000,
      attrCols: Seq[String] = Nil,
      refine: Boolean = true,
      buildParallelism: Int = 4): Unit = {
    shardedBuild(corpus, idCol, dir, nShards, buildParallelism) {
      (slice, out, sh) =>
        buildIvfPq(slice, idCol, vecCol, out, nlist, m, codes, seed + sh,
          fitSample, attrCols, refine)
    }
    val spark = corpus.sparkSession
    val total = (0 until nShards)
      .map(sh => readMeta(spark, s"$dir/shard=$sh", "ivfpq").nRows).sum
    writeMeta(spark, dir,
      Meta("ivfpq_sharded", idCol, total, nlist, tables = nShards, bits = 0,
        seed, refine))
  }

  /** Sharded twin of [[searchIvfPq]]: fan out, per-shard ADC (+int8
    * refine), bounded-heap merge. `refine` passes through per shard. */
  def searchIvfPqSharded(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      queryIdCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 0,
      corpusFilter: Option[org.apache.spark.sql.Column] = None,
      refine: Int = -1): DataFrame = {
    val m = readMeta(spark, dir, "ivfpq_sharded")
    mergeShardTopK(
      fanOut(m.tables)(sh =>
        searchIvfPq(spark, s"$dir/shard=$sh", queries, queryIdCol, vecCol,
          k, shardNprobe(spark, s"$dir/shard=$sh", "ivfpq", k, nprobe, m.tables),
          corpusFilter, refine)),
      m.idCol, k)
  }

  /** Sharded twin of [[appendIvfPq]]: rows route by the build's
    * [[shardOf]] rule and encode against THEIR shard's persisted
    * centroids + codebooks. */
  def appendIvfPqSharded(
      batch: DataFrame,
      vecCol: String,
      dir: String): Unit =
    shardedAppend(batch, dir, "ivfpq_sharded")(appendIvfPq(_, vecCol, _))

  /** Sharded twin of [[ensureIvfPq]]. */
  def ensureIvfPqSharded(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nShards: Int,
      nlist: Int = 0,
      m: Int = 8,
      codes: Int = 256,
      seed: Long = 0L,
      attrCols: Seq[String] = Nil,
      refine: Boolean = true): Unit =
    if (!exists(corpus.sparkSession, dir))
      buildIvfPqSharded(corpus, idCol, vecCol, dir, nShards, nlist, m,
        codes, seed, attrCols = attrCols, refine = refine)

  /** Change a sharded IVF index's shard count WITHOUT re-reading the
    * original corpus. The stored per-shard payloads carry the raw
    * vectors (`__cv` — [[Similarity.ivfNormalizedCorpus]] stores the
    * original, not the unit vector) and every attribute column, so
    * resharding is a rebuild from the index's own bytes: at 100 TB that
    * reads the index instead of re-scanning the full corpus, and it is
    * the documented growth path when a corpus outgrows its shard count
    * (per-shard cells cap at 65536 — more data wants more shards).
    *
    * Exactness: payload rows MOVE (new hash routing, re-fitted per-shard
    * cells) but are byte-identical for full-precision indexes, so
    * exhaustive-probe search equals brute force — and therefore equals
    * the pre-reshard exhaustive answer — row for row
    * (`ann_resharded_search_exact` full oracle). A QUANTIZED index
    * rebuilds from its int8-dequantized payload and re-quantizes (one
    * extra int8 round trip, drift bounded by quantization granularity);
    * the exhaustive contract then holds against the new payload.
    * IVF-PQ sharded indexes REFUSE: their codes are per-shard-codebook,
    * so moving rows across shards requires re-encoding from the refine
    * payload — an approximation-of-an-approximation; rebuild those from
    * the original corpus instead.
    *
    * Publish: the new index builds beside the old one
    * (`<dir>.resharding`), then swaps with checked renames (the
    * [[graft.io.Compaction]] contract — old index held at
    * `<dir>.preshard` until the swap completes; a crash between the
    * renames is recovered by the next [[reshardIvf]] call; searches in
    * the window fail loudly). Single-maintainer: don't append while a
    * reshard is in flight. */
  def reshardIvf(
      spark: SparkSession,
      dir: String,
      newShards: Int,
      nlist: Int = 0,
      seed: Long = 0L,
      buildParallelism: Int = 4): Unit =
    reshardSwap(spark, dir, "ivf_sharded", newShards) { (m, stored, out) =>
      val quantized = stored.columns.contains("__q")
      val attrs = (stored.columns.toSet
        -- Set(m.idCol, "__cv", "__q", "__cn", "__cell")).toSeq.sorted
      val corpus = scoringForm(stored, quantized)
        .select((m.idCol +: "__cv" +: attrs).map(col): _*)
      buildIvfSharded(corpus, m.idCol, "__cv", out, newShards,
        nlist, seed, quantize = quantized, attrCols = attrs,
        buildParallelism = buildParallelism)
    }

  /** Shard-count change for a sharded IVF-PQ index WITHOUT the original
    * corpus — available when the index stores the int8 refine payload
    * (`refine = true`, the DEFAULT): the corpus is reconstructed by
    * dequantizing `__q`, and because the per-vector symmetric quantizer
    * is IDEMPOTENT (the max-magnitude element maps to ±127 exactly, so
    * re-quantizing a dequantized payload reproduces codes and scale bit
    * for bit — spec-pinned), the new index's refine payload is
    * BIT-IDENTICAL to the old: zero added drift, and exhaustive-probe
    * refined search equals the pre-reshard answer row for row
    * (`ann_ivfpq_resharded_exact` full oracle). Per-shard codebooks and
    * coarse cells ARE re-fit — they are per-shard state by design; only
    * the ADC shortlist stage sees them, and a shortlist-covering refine
    * repairs it exactly as at build time. Codes-only indexes
    * (`refine = false`) REFUSE: codes decode only through their shard's
    * codebooks, and rebuilding from that reconstruction would stack
    * approximation on approximation — rebuild those from the original
    * corpus. Pending tombstones fold; publish/crash/single-maintainer
    * contracts are [[reshardIvf]]'s. */
  def reshardIvfPq(
      spark: SparkSession,
      dir: String,
      newShards: Int,
      nlist: Int = 0,
      seed: Long = 0L,
      buildParallelism: Int = 4): Unit =
    reshardSwap(spark, dir, "ivfpq_sharded", newShards) { (m, stored, out) =>
      require(stored.columns.contains("__q"),
        s"reshardIvfPq: the index at $dir is codes-only (refine = false) — " +
          "its vectors exist only as per-shard-codebook codes, and " +
          "re-encoding from that reconstruction would stack approximation " +
          "on approximation; rebuild from the original corpus instead")
      val shardMeta = readMeta(spark, s"$dir/shard=0", "ivfpq")
      val attrs = (stored.columns.toSet
        -- Set(m.idCol, "__q", "__cn", "__cell", "__codes", "__rn")).toSeq.sorted
      val corpus = stored
        .withColumn("__cv", Similarity.dequantizeInt8(col("__q")))
        .select((m.idCol +: "__cv" +: attrs).map(col): _*)
      buildIvfPqSharded(corpus, m.idCol, "__cv", out, newShards, nlist,
        m = shardMeta.tables, codes = shardMeta.bits, seed = seed,
        attrCols = attrs, refine = true,
        buildParallelism = buildParallelism)
    }

  /** The shared reshard core: crashed-swap recovery, tombstone-folded
    * union of the stored per-shard payloads, `build` into a staging
    * sibling, non-index state carry, checked-rename publish. */
  private def reshardSwap(
      spark: SparkSession, dir: String, expectKind: String, newShards: Int)(
      build: (Meta, DataFrame, String) => Unit): Unit = {
    require(newShards >= 1, s"newShards must be >= 1, got $newShards")
    import org.apache.hadoop.fs.Path
    val live = new Path(dir)
    val preshard = new Path(s"$dir.preshard")
    val staging = new Path(s"$dir.resharding")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recover a crashed swap: the old index is the authoritative copy
    if (!fs.exists(live)) {
      require(fs.exists(preshard),
        s"reshard: no index at $dir and no .preshard backup to recover")
      require(fs.rename(preshard, live),
        s"reshard: recovery rename $preshard -> $live failed")
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    val m = readMeta(spark, dir, expectKind)
    // pending tombstones fold here too: resharding rebuilds from the
    // stored payloads, and carrying a deleted row into a shard whose
    // tombstone table was left behind would RESURRECT it
    val stored = (0 until m.tables)
      .map(sh => minusTombstones(spark, s"$dir/shard=$sh", m.idCol,
        spark.read.parquet(s"$dir/shard=$sh/corpus.parquet")))
      .reduce(_.unionByName(_))
    build(m, stored, staging.toString)
    // carry NON-INDEX state across the swap: streaming maintainers keep
    // their replay markers (`_applied_batches/`, `_begun_batches/`)
    // inside the index directory — dropping them with the old layout
    // would make a micro-batch replayed after the reshard re-append its
    // rows (marker written, offsets uncommitted at a crash) and
    // duplicate them in the index (r17 ADVICE). Everything that is not
    // a shard, the top-level meta, or our own staging dirs is copied.
    val indexEntries = Set(MetaFile, ".staging_slices")
    fs.listStatus(live).foreach { st =>
      val n = st.getPath.getName
      if (!n.startsWith("shard=") && !indexEntries.contains(n))
        require(org.apache.hadoop.fs.FileUtil.copy(
          fs, st.getPath, fs, new Path(staging, n), false, true,
          spark.sparkContext.hadoopConfiguration),
          s"reshard: carrying $n into the resharded index failed")
    }
    if (fs.exists(preshard)) fs.delete(preshard, true)
    require(fs.rename(live, preshard),
      s"reshard: publish rename $live -> $preshard failed")
    require(fs.rename(staging, live),
      s"reshard: publish rename $staging -> $live failed " +
        s"(old index preserved at $preshard — rerun the reshard to recover)")
    fs.delete(preshard, true)
    // same stale-listing hazard as Compaction: a session that searched
    // the old layout holds its file listing in the shared cache
    spark.catalog.refreshByPath(dir)
  }

  /** Sharded twin of [[ensureIvf]]. */
  def ensureIvfSharded(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nShards: Int,
      nlist: Int = 0,
      seed: Long = 0L,
      attrCols: Seq[String] = Nil): Unit =
    if (!exists(corpus.sparkSession, dir))
      buildIvfSharded(corpus, idCol, vecCol, dir, nShards, nlist, seed,
        attrCols = attrCols)

  /** LSH twin of [[ensureIvf]]. */
  def ensureLsh(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      tables: Int = 8,
      bits: Int = 0,
      attrCols: Seq[String] = Nil): Unit =
    if (!exists(corpus.sparkSession, dir))
      buildLsh(corpus, idCol, vecCol, dir, tables, bits, attrCols = attrCols)

  // --------------------------------------------------------- compaction

  /** Compact a persisted index's data files — the OPTIMIZE-style
    * maintenance op for append-heavy indexes. Every [[appendIvf]] /
    * [[appendIvfPq]] / [[appendLsh]] call (and each streaming
    * micro-batch riding them, [[graft.streaming.Streaming]]) lands at
    * least one new parquet file per touched partition; after thousands
    * of micro-batches a probed cell holds thousands of KB-sized files
    * and the partition-pruned scan pays a per-file open + footer-parse
    * cost that dwarfs its data bytes — the classic small-file problem,
    * THE operational decay mode of a partitioned serving layout under
    * continuous ingest. Compaction rewrites the data table into
    * ~`targetFileMB` files and republishes in place. Search results are
    * IDENTICAL before and after (AnnIndexSpec pins it row for row):
    * compaction moves bytes, never answers.
    *
    * Layout contracts preserved per kind:
    *  - ivf / ivfpq: `corpus.parquet` stays partitioned by `__cell`,
    *    rows laid out by range over (`__cell`, id) — each output file
    *    covers a contiguous run, so cells stay whole-file prunable and
    *    an oversized cell splits at id boundaries instead of
    *    hot-spotting one writer task.
    *  - lsh: `signatures.parquet` stays partitioned by `table` and
    *    sig-sorted within files (range over (`table`, `sig`) + an
    *    in-partition sort), so row-group min/max pruning on the probed
    *    signature set stays sharp — an appended layout's many small
    *    sorted files become few large sorted files.
    *  - ivf_sharded / ivfpq_sharded: recurse per shard (each shard is a
    *    complete index with its own meta).
    *
    * Crash contract, staging, and the checked-rename publish live in
    * the shared core ([[graft.io.Compaction.compactParquet]] — also
    * behind [[graft.dedup.MinHashIndex.compact]]): a crash between the
    * publish renames leaves the backup intact and the live path absent,
    * searches fail loudly (never silently serve half an index), and the
    * next `compact` call restores the backup first. Data is never
    * deleted until the swap has fully succeeded. */
  def compact(spark: SparkSession, dir: String, targetFileMB: Int = 128): Unit = {
    require(exists(spark, dir), s"no ANN index at $dir — nothing to compact")
    val kind = kindOf(spark, dir)
    val m = readMeta(spark, dir, kind)
    // pending tombstones fold into the rewrite: the staged table is the
    // anti-joined survivor set (the shared core count-verifies against
    // the TRANSFORMED frame), the tombstone table is dropped after the
    // publish, and meta n_rows refreshes to the surviving count. Crash
    // between publish and the tombstone delete: the tombstones re-apply
    // as no-ops (those ids are already gone) and the next compact folds
    // an empty set — idempotent.
    val tombed = hasTombstones(spark, dir) && kind != "ivf_sharded" &&
      kind != "ivfpq_sharded"
    val fold: DataFrame => DataFrame =
      if (!tombed) identity
      else df => df.join(
        spark.read.parquet(s"$dir/$TombstoneFile").select(col(m.idCol)),
        Seq(m.idCol), "left_anti")
    def dropTombstones(): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$TombstoneFile")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    kind match {
      case "ivf" | "ivfpq" =>
        val after = graft.io.Compaction.compactParquet(spark,
          s"$dir/corpus.parquet", Seq("__cell", m.idCol), Some("__cell"),
          targetFileMB, fold)
        if (tombed) { dropTombstones(); writeMeta(spark, dir, m.copy(nRows = after)) }
      case "lsh" =>
        val after = graft.io.Compaction.compactParquet(spark,
          s"$dir/signatures.parquet", Seq("table", "sig"), Some("table"),
          targetFileMB, fold)
        // the signature table stores one replica per LSH table
        if (tombed) { dropTombstones(); writeMeta(spark, dir, m.copy(nRows = after / m.tables)) }
      case "ivf_sharded" | "ivfpq_sharded" =>
        val inner = if (kind == "ivf_sharded") "ivf" else "ivfpq"
        (0 until m.tables)
          .foreach(sh => compact(spark, s"$dir/shard=$sh", targetFileMB))
        // per-shard folds may have shrunk shard counts — re-sum the top
        val total = (0 until m.tables)
          .map(sh => readMeta(spark, s"$dir/shard=$sh", inner).nRows).sum
        if (total != m.nRows) writeMeta(spark, dir, m.copy(nRows = total))
      case other => throw new IllegalArgumentException(
        s"compact: unknown index kind '$other' at $dir")
    }
  }
}
