package graft

import java.nio.file.Files

import graft.dedup.{Dedup, MinHashIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persistable MinHash dedup index: the corpus side of incremental
  * near-dup dedup paid once, then served from the persisted layers. */
class MinHashIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"), col("text"))

  private def ids(df: DataFrame): Seq[Long] =
    df.select(col("doc_id").cast("long")).collect().map(_.getLong(0)).sorted.toSeq

  test("indexed dedup equals the one-shot incremental operator") {
    val dir = Files.createTempDirectory("graft_mh_idx").toString
    val corpus = docs.filter(col("doc_id") < 100)
    MinHashIndex.build(corpus, "doc_id", "text", dir)
    // the dedup_minhash_incremental query's batch shape: mutated copies of
    // corpus docs (must drop) + fresh docs (must survive)
    val batch = corpus.filter(col("doc_id") < 25)
      .select((col("doc_id") + 200000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text"))
      .unionByName(docs.filter(col("doc_id") >= 100 && col("doc_id") < 150))
    val fromIndex = ids(
      MinHashIndex.dedupBatch(spark, dir, batch, "text", threshold = 0.6))
    val oneShot = ids(
      Dedup.incrementalNearDupDedup(batch, corpus, "doc_id", "text", threshold = 0.6))
    assert(fromIndex.nonEmpty)
    assert(fromIndex === oneShot,
      "the index changes where the corpus side lives, never the answer")
    // sanity on the shape: every fresh doc survives, no mutated copy does
    assert(fromIndex.forall(_ < 200000))
  }

  test("append keeps later batches deduping against accepted rows") {
    val dir = Files.createTempDirectory("graft_mh_append").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 100), "doc_id", "text", dir)
    // accept a fresh batch into the index
    val accepted = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
    MinHashIndex.append(spark, dir, accepted, "text")
    // a later batch: near-dups of the APPENDED docs (not the original
    // corpus) must now be dropped; genuinely new docs survive
    val later = accepted.filter(col("doc_id") < 105)
      .select((col("doc_id") + 500000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text"))
      .unionByName(docs.filter(col("doc_id") >= 200 && col("doc_id") < 210))
    val survivors = ids(
      MinHashIndex.dedupBatch(spark, dir, later, "text", threshold = 0.6))
    assert(survivors === (200L until 210L),
      s"appended-doc near-dups must drop, fresh docs survive: $survivors")
  }

  test("compact merges appended small files without changing any probe result") {
    val dir = Files.createTempDirectory("graft_mh_compact").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 100), "doc_id", "text", dir)
    // several appends: the streaming corpus-maintainer shape that
    // litters both persisted layers with per-batch small files
    (0 until 3).foreach { i =>
      MinHashIndex.append(spark,
        dir, docs.filter(col("doc_id") >= 100 + i * 20 && col("doc_id") < 120 + i * 20),
        "text")
    }
    val probe = docs.filter(col("doc_id") < 105)
      .select((col("doc_id") + 700000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text"))
      .unionByName(docs.filter(col("doc_id") >= 300 && col("doc_id") < 310))
    def survivors() = ids(
      MinHashIndex.dedupBatch(spark, dir, probe, "text", threshold = 0.6))
    def files(table: String): Int = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$table")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext)
        if (it.next().getPath.getName.startsWith("part-")) n += 1
      n
    }
    val want = survivors()
    val (b0, s0) = (files("buckets.parquet"), files("shingles.parquet"))
    MinHashIndex.compact(spark, dir)
    assert(survivors() === want,
      "compaction must move bytes, never probe answers")
    assert(files("buckets.parquet") < b0 && files("shingles.parquet") < s0,
      s"both layers should shrink: buckets $b0 -> ${files("buckets.parquet")}, " +
        s"shingles $s0 -> ${files("shingles.parquet")}")
  }

  test("pre-signature indexes probe correctly (unscreened fallback)") {
    val dir = Files.createTempDirectory("graft_mh_legacy").toString
    val corpus = docs.filter(col("doc_id") < 100)
    MinHashIndex.build(corpus, "doc_id", "text", dir)
    // new indexes carry the screening signature
    assert(spark.read.parquet(s"$dir/buckets.parquet").columns.contains("__sig"))
    // simulate an index written before the signature column existed:
    // rewrite the bucket table without it
    val stripped = spark.read.parquet(s"$dir/buckets.parquet").drop("__sig")
    val tmp = Files.createTempDirectory("graft_mh_legacy_b").toString
    stripped.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(s"$dir/buckets.parquet")
    val batch = corpus.filter(col("doc_id") < 25)
      .select((col("doc_id") + 200000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text"))
      .unionByName(docs.filter(col("doc_id") >= 100 && col("doc_id") < 150))
    val survivors = ids(
      MinHashIndex.dedupBatch(spark, dir, batch, "text", threshold = 0.6))
    assert(survivors.nonEmpty && survivors.forall(_ < 200000),
      s"legacy index must still dedup (unscreened): $survivors")
  }

  test("deleteIds retracts a doc: its near-dups pass, compact folds both layers") {
    val dir = Files.createTempDirectory("graft_mh_del").toString
    val corpus = docs.filter(col("doc_id") < 100)
    MinHashIndex.build(corpus, "doc_id", "text", dir)
    // a near-dup of indexed doc 7 is suppressed by the index
    val batch = corpus.filter(col("doc_id") === 7)
      .select((col("doc_id") + 200000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text"))
    assert(ids(MinHashIndex.dedupBatch(spark, dir, batch, "text", 0.6)).isEmpty,
      "precondition: the near-dup of an indexed doc must drop")
    // retract doc 7 (a decontamination hit / takedown): the same batch
    // now SURVIVES — the retracted doc no longer suppresses anything
    import spark.implicits._
    MinHashIndex.deleteIds(spark, dir, Seq(7L).toDF("doc_id"))
    assert(ids(MinHashIndex.dedupBatch(spark, dir, batch, "text", 0.6)) ===
      Seq(200007L))
    // fold: tombstones leave disk, both layers shrink, n_rows refreshes,
    // and probe results are unchanged (the fold is the same answer the
    // anti-join served)
    MinHashIndex.compact(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones.parquet").exists())
    assert(spark.read.parquet(s"$dir/shingles.parquet")
      .filter(col("doc_id") === 7).count() === 0)
    assert(spark.read.parquet(s"$dir/buckets.parquet")
      .filter(col("doc_id") === 7).count() === 0)
    assert(spark.read.parquet(s"$dir/meta.parquet").head()
      .getAs[Long]("n_rows") === 99L)
    assert(ids(MinHashIndex.dedupBatch(spark, dir, batch, "text", 0.6)) ===
      Seq(200007L))
    // re-adding the retracted doc AFTER the fold re-arms suppression
    MinHashIndex.append(spark, dir, corpus.filter(col("doc_id") === 7), "text")
    assert(ids(MinHashIndex.dedupBatch(spark, dir, batch, "text", 0.6)).isEmpty)
  }

  test("stats reports rows, tombstones, and layer decay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_mh_stats").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 60), "doc_id", "text", dir)
    val s0 = MinHashIndex.stats(spark, dir).head()
    assert(s0.getAs[Long]("n_rows") === 60L)
    assert(s0.getAs[Long]("pending_tombstones") === 0L)
    assert(s0.getAs[Long]("bucket_files") > 0 && s0.getAs[Long]("shingle_bytes") > 0)
    MinHashIndex.deleteIds(spark, dir, Seq(5L, 6L).toDF("doc_id"))
    assert(MinHashIndex.stats(spark, dir).head()
      .getAs[Long]("pending_tombstones") === 2L)
    MinHashIndex.compact(spark, dir)
    val s1 = MinHashIndex.stats(spark, dir).head()
    assert(s1.getAs[Long]("pending_tombstones") === 0L)
    assert(s1.getAs[Long]("n_rows") === 58L)
  }

  test("replayed release is idempotent: self-pairs excluded, indexedIds guards the append") {
    val dir = Files.createTempDirectory("graft_mh_replay").toString
    val release = docs.filter(col("doc_id") < 120)
    // release 1 dedups within itself and its accepted docs build the index
    val accepted = Dedup.nearDupDedup(release, "doc_id", "text", 0.6, 3)
    MinHashIndex.build(accepted, "doc_id", "text", dir)
    // the destructive-retry trap: replaying the SAME release against an
    // index that already carries its accepted docs used to match every
    // doc to its own entry at jaccard 1.0 and annihilate the output.
    // Self-exclusion makes the replay republish the identical survivors.
    val replay = ids(MinHashIndex.dedupBatch(spark, dir, release, "text", 0.6))
    assert(replay === ids(accepted),
      "a replayed release must republish the same accepted set, not an empty one")
    // …and pairs() itself reports no self-matches for an indexed batch
    val p = MinHashIndex.pairs(spark, dir, accepted, "text", 0.6)
    assert(p.filter(col("doc_id") === col("corpus_id")).count() === 0)
    // the append guard: everything in the replayed accepted set is
    // already indexed, so the fresh slice is empty — no duplicate rows
    val fresh = accepted.join(MinHashIndex.indexedIds(spark, dir),
      Seq("doc_id"), "left_anti")
    assert(fresh.count() === 0)
    val bucketRows = spark.read.parquet(s"$dir/buckets.parquet").count()
    MinHashIndex.append(spark, dir, fresh, "text")
    assert(spark.read.parquet(s"$dir/buckets.parquet").count() === bucketRows,
      "appending the guarded (empty) slice must add no index rows")
  }

  test("duplicate shingle rows (append crash window) never duplicate pairs; compact heals them") {
    // the window: append commits the shingle write, crashes before the
    // bucket write; indexedIds keys on buckets, so the replay guard
    // legitimately re-appends the batch — its shingle rows land TWICE
    val dir = Files.createTempDirectory("graft_mh_dupsh").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 100), "doc_id", "text", dir)
    val before = MinHashIndex.pairs(spark, dir,
      docs.filter(col("doc_id") < 100).select(
        (col("doc_id") + 300000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text")),
      "text", 0.6).orderBy("doc_id", "corpus_id").collect()
    assert(before.nonEmpty)
    // simulate the crash replay: re-append the shingle rows of 40 docs
    // exactly as a replayed append would (byte-identical, buckets intact)
    val sh = spark.read.parquet(s"$dir/shingles.parquet")
    sh.filter(col("doc_id") < 40).write
      .mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$dir/shingles.parquet")
    spark.catalog.refreshByPath(s"$dir/shingles.parquet")
    // probes stay exact: the output-sized dedup screens the fan-out
    val during = MinHashIndex.pairs(spark, dir,
      docs.filter(col("doc_id") < 100).select(
        (col("doc_id") + 300000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text")),
      "text", 0.6).orderBy("doc_id", "corpus_id").collect()
    assert(during.toSeq === before.toSeq,
      "duplicate shingle rows must not duplicate or alter pair rows")
    // the next maintenance fold heals the layer physically
    val distinctIds = sh.select("doc_id").distinct().count()
    MinHashIndex.compact(spark, dir)
    spark.catalog.refreshByPath(s"$dir/shingles.parquet")
    val healed = spark.read.parquet(s"$dir/shingles.parquet")
    assert(healed.count() === distinctIds,
      "compact must fold duplicate shingle rows back to one per id")
    val after = MinHashIndex.pairs(spark, dir,
      docs.filter(col("doc_id") < 100).select(
        (col("doc_id") + 300000).as("doc_id"),
        regexp_replace(col("text"), "^\\S+", "graftmutated").as("text")),
      "text", 0.6).orderBy("doc_id", "corpus_id").collect()
    assert(after.toSeq === before.toSeq)
  }

  test("append refuses a pending-tombstone id until the fold") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_mh_reapp").toString
    MinHashIndex.build(docs.filter(col("doc_id") < 50), "doc_id", "text", dir)
    MinHashIndex.deleteIds(spark, dir, Seq(7L).toDF("doc_id"))
    // the release jobs' indexedIds guard must NOT silently skip the
    // pending id (its rows still occupy the layers, but it is not
    // SERVED): the re-accepted doc reaches append, where the refusal
    // below fires — loud, never published-but-unindexed
    assert(MinHashIndex.indexedIds(spark, dir)
      .filter(col("doc_id") === 7).count() === 0,
      "indexedIds must exclude pending-tombstone ids")
    val e = intercept[IllegalArgumentException] {
      MinHashIndex.append(spark, dir, docs.filter(col("doc_id") === 7), "text")
    }
    assert(e.getMessage.contains("pending tombstones") && e.getMessage.contains("7"))
    MinHashIndex.compact(spark, dir)
    MinHashIndex.append(spark, dir, docs.filter(col("doc_id") === 7), "text")
    assert(spark.read.parquet(s"$dir/buckets.parquet")
      .filter(col("doc_id") === 7).count() > 0)
  }

  test("missing index fails loudly") {
    val e = intercept[IllegalArgumentException] {
      MinHashIndex.dedupBatch(
        spark, Files.createTempDirectory("graft_mh_empty").toString,
        docs.limit(1), "text", 0.5)
    }
    assert(e.getMessage.contains("no MinHash index"))
  }
}
