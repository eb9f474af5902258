package graft

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again"),
    (1L, "the quick brown fox jumps over the lazy cat again and again"), // near-dup of 0
    (2L, "completely different content about spark query engines at scale"),
    (3L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
    (4L, "unrelated text with its own words nothing shared here at all")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the smallest id per content") {
    val kept = Dedup.exactDedupKeys(docs, "doc_id", "text")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L, 4L)) // 3 deduped into 0
    // idempotent: deduping the deduped set changes nothing
    val again = Dedup.exactDedup(docs, "doc_id", "text")
    assert(Dedup.exactDedup(again, "doc_id", "text").count() == again.count())
  }

  test("incremental dedup drops corpus-known and batch-internal duplicates") {
    val corpus = Seq((1L, "the existing document"), (2L, "another old one")).toDF("id", "text")
    val batch = Seq(
      (10L, "a brand new document"),
      (11L, "THE  existing   document"), // normalizes to corpus #1 → dropped
      (12L, "a brand  NEW document"),    // normalizes to batch #10 → dropped
      (13L, "also new here")).toDF("id", "text")
    val kept = Dedup.incrementalExactDedup(batch, corpus, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(10L, 13L))
  }

  test("contamination report: exact copy covers eval fully, unrelated absent") {
    val evalSet = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different benchmark question here today")).toDF("id", "text")
    val corpus = Seq(
      (100L, "prefix words the quick brown fox jumps over the lazy dog suffix"),
      (101L, "nothing in common with either document whatsoever right")).toDF("id", "text")
    val rep = Dedup.contaminationReport(corpus, evalSet, "id", "text", k = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(1), r.getLong(0)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // eval 1 has 7 distinct 3-grams, all present in corpus 100 → coverage 1.0
    assert(rep((1L, 100L)) == ((7L, 1.0)))
    assert(rep.size == 1) // eval 2 and corpus 101 appear nowhere
  }

  test("minhash LSH finds planted near-dup and exact dup, not unrelated") {
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup
    assert(pairs.contains((0L, 1L))) // one-word edit
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical texts hash equal; near-dup within small hamming") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(3L))
    val d01 = java.lang.Long.bitCount(sigs(0L) ^ sigs(1L))
    val d04 = java.lang.Long.bitCount(sigs(0L) ^ sigs(4L))
    assert(d01 < d04)
  }

  test("minhash near-dup leaves no cached state behind (persist leak fix)") {
    // compare SETS, not sizes: earlier suites' persisted RDDs can be
    // reclaimed asynchronously by the ContextCleaner mid-test (a size
    // DECREASE flunked this under r17's suite ordering) — the leak
    // contract is only that this call adds nothing of its own
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.4).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"minhashNearDupPairs must not leak persisted RDDs into the shared session (leaked ids: $leaked)")
  }

  test("simhash near-dup has full recall at maxHamming 8 (chunk count derived)") {
    // 24 mutated copies of a 24-token base: signature distances spread well
    // past 3, so the old fixed 4x16-bit chunking would drop pairs at 4..8.
    val base = (0 until 24).map(i => s"tok$i")
    val muts = (0 until 24).map { m =>
      val words = base.zipWithIndex.map { case (w, i) =>
        if ((i * 7 + m * 13) % 9 == 0) s"alt${m}_$i" else w
      }
      (m.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val sigs = muts.select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 8
    } yield (a, b)).toSet
    val lsh = Dedup.simhashNearDupPairs(muts, "doc_id", "text", maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "test construction must yield pairs within hamming 8")
    assert(brute.exists { case (a, b) => java.lang.Long.bitCount(sigs(a) ^ sigs(b)) > 3 },
      "test construction must yield pairs at hamming 4..8 (the old blind spot)")
    assert(lsh == brute, s"bucketed simhash must equal brute force; missed ${brute -- lsh}")
  }

  test("simhash rejects maxHamming outside [0, 31]") {
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 40)
    }
  }

  test("simhash maxHamming = 0 (single 64-bit chunk) finds exact signature matches") {
    // regression: (1L << 64) - 1 is 0 on the JVM — the old mask zeroed every
    // key and the bucket cap could then silently drop the whole corpus
    val pairs = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 3L))) // the byte-identical pair, nothing else
  }

  test("near-dup clusters: transitive chains collapse to the smallest id") {
    import spark.implicits._
    // chain 1-2-3 (transitively one cluster even though (1,3) is no pair),
    // separate pair 7-9, isolated node untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val clusters = graft.dedup.Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
    // a 15-hop chain converges well inside the default iteration budget
    // (pointer jumping: O(log diameter), not one hop per iteration)
    val chain = (1L to 15L).sliding(2).map(s => (s.head, s.last)).toSeq.toDF("id_a", "id_b")
    val chained = graft.dedup.Dedup.nearDupClusters(chain)
      .as[(Long, Long)].collect().toMap
    assert(chained.values.toSet == Set(1L), s"15-hop chain must collapse to cluster 1; got $chained")
  }

  test("near-dup clusters: driver union-find fast path equals the distributed loop") {
    import spark.implicits._
    // a mix of chains, stars and singetons-by-absence plus id order that
    // exercises union-by-min across merge directions
    val edges = ((1L to 25L).sliding(2).map(s => (s.head, s.last)).toSeq ++
      Seq((40L, 45L), (45L, 41L), (41L, 48L), (60L, 61L), (90L, 70L), (70L, 80L)))
    val pairs = edges.toDF("id_a", "id_b")
    val fast = graft.dedup.Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val dist = graft.dedup.Dedup.nearDupClusters(pairs, driverMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(fast === dist, "fast path and distributed loop must agree exactly")
    assert(fast.values.toSet === Set(1L, 40L, 60L, 70L))
    // an over-bound edge list falls through to the distributed loop and
    // still produces the same labels
    val forced = graft.dedup.Dedup.nearDupClusters(pairs, driverMaxEdges = 3)
      .as[(Long, Long)].collect().toMap
    assert(forced === dist)
    // int ids keep their type through the fast path
    val intPairs = Seq((1, 2), (2, 3)).toDF("id_a", "id_b")
    val out = graft.dedup.Dedup.nearDupClusters(intPairs)
    assert(out.schema("id").dataType === org.apache.spark.sql.types.IntegerType)
    assert(out.as[(Int, Int)].collect().toMap === Map(1 -> 1, 2 -> 1, 3 -> 1))
  }

  test("near-dup clusters: reliable checkpoint dir yields identical labels to the local fallback") {
    import spark.implicits._
    val sc = spark.sparkContext
    val pairs = ((1L to 15L).sliding(2).map(s => (s.head, s.last)).toSeq ++
      Seq((20L, 22L), (22L, 21L), (30L, 31L))).toDF("id_a", "id_b")
    val prevDir = sc.getCheckpointDir
    try {
      // force the localCheckpoint fallback regardless of suite ordering
      org.apache.spark.sql.graft.Bridge.clearCheckpointDir(sc)
      val viaLocal = graft.dedup.Dedup.nearDupClusters(pairs, driverMaxEdges = 0)
        .as[(Long, Long)].collect().toMap
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-spec")
      sc.setCheckpointDir(dir.toString)
      val viaReliable = graft.dedup.Dedup.nearDupClusters(pairs, driverMaxEdges = 0)
        .as[(Long, Long)].collect().toMap
      assert(viaReliable == viaLocal, "checkpoint mode must not change cluster labels")
      assert(viaLocal.values.toSet == Set(1L, 20L, 30L))
      // the reliable path must actually have written checkpoint files
      val wrote = java.nio.file.Files.walk(dir).filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir — reliable path not taken")
    } finally {
      org.apache.spark.sql.graft.Bridge.clearCheckpointDir(sc)
      prevDir.foreach(sc.setCheckpointDir)
    }
  }

  test("nearDupDedup keeps one survivor per near-dup cluster") {
    // docs 0 and 1 are near-dups (one-word edit), 3 is an exact dup of 0 —
    // expect exactly one survivor (doc 0) from that cluster; 2 and 4 stay
    val survivors = Dedup.nearDupDedup(docs, "doc_id", "text", threshold = 0.4)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 2L, 4L), s"got $survivors")
  }

  test("ngram jaccard: near-dup pair scores high, distinct pair absent") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, minJaccard = 0.3)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    val m = pairs.map { case (a, b, j) => (a, b) -> j }.toMap
    assert(m((0L, 3L)) == 1.0)
    assert(m((0L, 1L)) > 0.5 && m((0L, 1L)) < 1.0)
    assert(!m.contains((2L, 4L)))
  }

  test("fingerprints: whitespace-insensitive, shingle fp survives tail edit") {
    val df = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "  alpha   beta gamma delta epsilon zeta eta theta "),
      (2L, "alpha beta gamma delta epsilon zeta eta CHANGED")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("f"),
        TextAnalysis.shingleFingerprint(col("text"), 3).as("sf"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fps(0L)._1 == fps(1L)._1) // normalization
    assert(fps(0L)._1 != fps(2L)._1)
  }

  test("cosine topk: exact neighbor ranking on constructed vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", "vec_id", 2)
      .select("vec_id", "rank").as[(Long, Int)].collect().toMap
    assert(top(1L) == 1) // most similar
  }

  test("incremental near-dup: corpus matches and in-batch losers dropped, fresh docs survive") {
    def doc(seed: Int) =
      (0 until 30).map(j => s"t${seed}x$j").mkString(" ")
    val corpus = (0L until 10L).map(i => (i, doc(i.toInt))).toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of corpus doc 3 (one token changed) — must be dropped
      (100L, doc(3).replaceFirst("^\\S+", "changed")),
      // fresh pair of in-batch near-dups — only the smaller id survives
      (101L, doc(55)),
      (102L, doc(55).replaceFirst("^\\S+", "tweaked")),
      // fresh unique doc — survives
      (103L, doc(77))).toDF("doc_id", "text")
    val cross = Dedup.minhashNearDupPairsIncremental(
      batch, corpus, "doc_id", "text", threshold = 0.5)
    val crossPairs = cross.select("doc_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(crossPairs == Set((100L, 3L)))
    val survivors = Dedup.incrementalNearDupDedup(
      batch, corpus, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(101L, 103L))
    // empty corpus degenerates to plain within-batch near-dup dedup
    val empty = corpus.filter(col("doc_id") < 0)
    val solo = Dedup.incrementalNearDupDedup(batch, empty, "doc_id", "text", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(solo == Set(100L, 101L, 103L))
  }

  test("mmr rerank trades relevance for diversity at low lambda") {
    // c1/c2 near-identical and most relevant; c3 diverse, slightly less
    val shortlist = Seq(
      (0L, 1L, 0.99, Array(0.99, 0.14, 0.0)),
      (0L, 2L, 0.99, Array(0.99, 0.14, 0.001)),
      (0L, 3L, 0.80, Array(0.8, 0.6, 0.0))
    ).toDF("query_id", "vec_id", "cosine", "vec")
    def picks(lambda: Double) = Similarity
      .mmrRerank(shortlist, "query_id", "vec_id", "vec", k = 2, lambda)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(picks(1.0) == Seq(1L, 2L))   // pure relevance = plain top-k
    assert(picks(0.3) == Seq(1L, 3L))   // diversity penalty evicts the twin
    // k larger than the shortlist returns everything, ranks contiguous
    val all = Similarity.mmrRerank(shortlist, "query_id", "vec_id", "vec", 10, 0.5)
    assert(all.select("rank").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("nearest centroid recovers cluster membership on separated vectors") {
    // two tight clusters around orthogonal axes + a stray point
    val vecs = Seq(
      (0L, 0, Array(1.0f, 0.1f, 0.0f)),
      (1L, 0, Array(0.9f, 0.0f, 0.1f)),
      (2L, 1, Array(0.0f, 1.0f, 0.1f)),
      (3L, 1, Array(0.1f, 0.9f, 0.0f)),
      (4L, 1, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "label", "embedding")
    val cells = Similarity.labelCentroidCells(vecs, "label", "embedding")
    assert(cells.count() == 6) // 2 labels x 3 dims
    val m = cells.filter(col("label") === 0 && col("dim") === 0)
      .select("mean_val").as[Double].head()
    assert(math.abs(m - 0.95) < 1e-6)
    val cent = Similarity.labelCentroids(vecs, "label", "embedding")
    val pred = Similarity
      .nearestCentroid(vecs, "vec_id", "embedding", cent, "label")
      .select("vec_id", "pred_label").as[(Long, Int)].collect().toMap
    assert(pred == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1))
    // a query vector between the clusters but closer to axis 1 assigns to 1
    val q = Seq((99L, Array(0.4f, 0.6f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.nearestCentroid(q, "vec_id", "embedding", cent, "label")
      .select("pred_label").as[Int].head() == 1)
  }

  test("embedding near-dup finds planted duplicate vectors") {
    val n = 40
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 17 + j * 3).toFloat))
    }
    val planted = (vecs ++ vecs.map { case (id, v) => (id + 1000, v) })
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(planted, "vec_id", "embedding", 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (0 until n).map(i => (i.toLong, i + 1000L)).toSet
    assert(expected.subsetOf(pairs), s"missed planted pairs: ${expected -- pairs}")
  }

  test("semDedup: planted semantic twins die, originals and singletons survive") {
    val n = 40
    // pairwise-orthogonal originals: the ONLY pairs at cosine >= 0.999
    // are the planted clones (a sin-tabulated frame has natural aliases)
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(64)(j => if (j == i) 1f else 0f))
    }
    // clones (+1000) and a near-clone (+2000, one coordinate nudged)
    val nearClone = vecs.head match { case (_, v) =>
      val w = v.clone(); w(1) = 1e-4f; (2000L, w)
    }
    val planted = (vecs ++ vecs.map { case (id, v) => (id + 1000, v) } :+ nearClone)
      .toDF("vec_id", "embedding")
    val survivors = Similarity.semDedup(planted, "vec_id", "embedding",
      nClusters = 6, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // every exact clone is dropped, every original kept; the near-clone of
    // vec 0 (cosine ~ 1 - eps) is also above threshold and dies
    assert((0 until n).forall(i => survivors(i.toLong)))
    assert((0 until n).forall(i => !survivors(i + 1000L)), "a clone survived")
    assert(!survivors(2000L), "the near-clone survived")
    // pairs carry the true cosine; clone pairs are exactly 1.0
    val pairs = Similarity.semDedupPairs(planted, "vec_id", "embedding",
      nClusters = 6, threshold = 0.999)
    val cloneCos = pairs.filter(col("id_a") === 5 && col("id_b") === 1005)
      .select("cosine").as[Double].head()
    assert(cloneCos == 1.0)
    // determinism: seeded quantizer, stable survivor set
    val again = Similarity.semDedup(planted, "vec_id", "embedding",
      nClusters = 6, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(again == survivors)
  }

  test("semDedup: unreachable threshold drops nothing, zero vectors pass through") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)),
      (2L, Array(0f, 0f, 1f)), (3L, Array(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val survivors = Similarity.semDedup(vecs, "vec_id", "embedding",
      nClusters = 2, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 1L, 2L, 3L)) // orthogonal + zero-norm all survive
  }

  test("ivf topk achieves high recall vs brute force") {
    val n = 80
    val vecs = (0 until n).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 17 + j * 3).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val brute = Similarity.cosineTopK(vecs, queries, "vec_id", "embedding", "vec_id", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfCosineTopK(vecs, queries, "vec_id", "embedding", "vec_id", 5,
        nlist = 8, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
    // determinism: seeded quantizer, stable output
    val again = Similarity.ivfCosineTopK(vecs, queries, "vec_id", "embedding", "vec_id", 5,
        nlist = 8, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again == ivf)
  }

  test("two-level ivf fit: exact at nprobe=nlist, deterministic, full coverage") {
    import spark.implicits._
    // 6000 rows with 2500 requested cells forces the TWO-LEVEL fit
    // (> IvfFlatFitMaxCells = 2048): at nprobe = nlist the search is
    // exact no matter how the quantizer carved the space, so equality
    // with brute force proves the two-level assignment is a real
    // partition (every row in exactly one probed cell, none dropped)
    val corpus = graft.tools.Recall.clusteredCorpus(
      spark, n = 6000L, dims = 8, clusters = 64, noise = 1.0)
    val queries = corpus.filter(col("vec_id") < 15)
    val norm = Similarity.ivfNormalizedCorpus(corpus, "vec_id", "vec")
    val model = Similarity.ivfFit(norm, "vec_id", cells = 2500, seed = 7L,
      fitSample = 100000)
    assert(model.isInstanceOf[Similarity.TwoLevelQuantizer])
    val cents = Similarity.ivfCentroidFrame(spark, model)
    val nCells = cents.count()
    assert(nCells >= 2000 && nCells <= 2600, s"cell count off: $nCells")
    val assigned = model.transform(norm)
    assert(assigned.filter(col("__cell").isNull).count() === 0)
    assert(assigned.count() === 6000)
    // assignment is a pure function of the fit: same cells on re-run
    val a1 = assigned.select(col("vec_id"), col("__cell"))
      .as[(Long, Int)].collect().toMap
    val a2 = model.transform(norm).select(col("vec_id"), col("__cell"))
      .as[(Long, Int)].collect().toMap
    assert(a1 === a2)
    // cells assigned are exactly the fitted ids
    val ids = cents.select("__cell").as[Int].collect().toSet
    assert(a1.values.toSet.subsetOf(ids))
    val exact = Similarity.cosineTopK(corpus, queries, "vec_id", "vec", "vec_id", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val viaIvf = Similarity.ivfCosineTopK(corpus, queries, "vec_id", "vec",
        "vec_id", 10, nlist = 2500, nprobe = 2500)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(viaIvf === exact)
  }

  test("localLloyd: two planted blobs yield their means; k clamps to n") {
    val blobA = Array.tabulate(10)(i => Array(0.0 + i * 0.01, 0.0))
    val blobB = Array.tabulate(10)(i => Array(10.0 + i * 0.01, 5.0))
    val cents = Similarity.localLloyd(blobA ++ blobB, k = 2, iters = 8)
    assert(cents.length === 2)
    val sorted = cents.sortBy(_(0))
    assert(math.abs(sorted(0)(0) - 0.045) < 1e-9 && sorted(0)(1) === 0.0)
    assert(math.abs(sorted(1)(0) - 10.045) < 1e-9 && sorted(1)(1) === 5.0)
    // k > n clamps; empty input yields no centroids
    assert(Similarity.localLloyd(blobA.take(3), k = 10, iters = 3).length === 3)
    assert(Similarity.localLloyd(Array.empty, k = 4, iters = 3).isEmpty)
  }

  test("ivf auto params: sqrt-N cells, candidate-pool probe floor, caps") {
    import Similarity.{ivfAutoNlist, ivfAutoNprobe}
    // sqrt scaling with the 16 floor and the (r16-lifted) 65536 cap:
    // √N holds to ~4.3e9 vectors now that the two-level fit pays for
    // large cell counts
    assert(ivfAutoNlist(500L) == 22)        // sqrt(500) ~ 22
    assert(ivfAutoNlist(2000L) == 45)       // sqrt(2000) ~ 45
    assert(ivfAutoNlist(100L) == 16)        // floor
    assert(ivfAutoNlist(1_000_000_000L) == 31623) // sqrt holds past the old 4096 cap
    assert(ivfAutoNlist(10_000_000_000L) == 65536) // the new cap
    assert(ivfAutoNlist(4L) == 4)           // never more cells than rows
    // DIMS-AWARE cap (r17, r16 ADVICE): cells·dims stays under the 8M-
    // double (64 MB) centroid broadcast budget. At 64 dims the flat
    // 65536 cap binds first — every pre-r17 operating point unchanged;
    // at production embedding widths the cap scales down.
    assert(ivfAutoNlist(10_000_000_000L, 64) == 65536)
    assert(ivfAutoNlist(10_000_000_000L, 128) == 65536)  // 8M/128 = 65536 exactly
    assert(ivfAutoNlist(10_000_000_000L, 768) == 10922)  // 8M/768
    assert(ivfAutoNlist(10_000_000_000L, 1536) == 5461)  // 8M/1536
    assert(ivfAutoNlist(10_000_000_000L, 100000) == 1024) // functional floor
    assert(ivfAutoNlist(1_000_000L, 1536) == 1000) // sqrt below the cap: unchanged
    // SMALL regime (N < 100k): max(cells/3, 30·k pool) — the r8 rule,
    // tuned for recall >= 0.85 even on near-uniform data:
    // 22 cells on 500 rows at k=10 -> ceil(22*300/500) = 14, not 22/3=7
    assert(ivfAutoNprobe(22, 500L, 10) == 14)
    assert(ivfAutoNprobe(45, 2000L, 10) == 15)
    // never more probes than cells
    assert(ivfAutoNprobe(16, 10L, 10) == 16)
    // BLEND ramp (50k <= N < 100k): the policy is CONTINUOUS in corpus
    // size — the r15 cliff (105 probes at 99,999 rows vs 8 at 100,000,
    // a 13x step from one row) is gone. Just below the boundary the
    // blend lands on the scale rule; at the ramp start it equals the
    // small rule; mid-ramp it interpolates.
    assert(ivfAutoNprobe(316, 99999L, 10) == 8)   // ~= the N=100k answer
    assert(ivfAutoNprobe(316, 50000L, 10) == 105) // == small rule at ramp start
    assert(ivfAutoNprobe(316, 49999L, 10) == 105) // small regime below ramp
    assert(ivfAutoNprobe(316, 75000L, 10) == 58)  // round(105/2 + 11/2)
    // one-row steps near every seam move the answer by at most ~0.2%
    // of the small-rule level (the interpolation slope), never 13x
    assert(math.abs(ivfAutoNprobe(316, 74999L, 10) - ivfAutoNprobe(316, 75001L, 10)) <= 1)
    // SCALE regime (N >= 100k): the 240·k candidate-pool target is
    // PRIMARY with the absolute 8-cell floor — the r14 fix: the old
    // cells/3 floor made every auto query scan >= N/3 candidates
    assert(ivfAutoNprobe(316, 100000L, 10) == 8)    // pool byK = 8 = floor
    assert(ivfAutoNprobe(1000, 1_000_000L, 10) == 8) // byK = 3, floor 8
    assert(ivfAutoNprobe(4096, 1_000_000_000L, 10) == 8) // byK = 1, floor 8
    // byK drives when cells are plentiful relative to N
    assert(ivfAutoNprobe(4096, 200_000L, 10) == 50)  // ceil(4096*2400/2e5)
    // the expected candidate pool at the floor is occupancy-bound:
    // 8·N/nlist — 0.2% of the corpus at the 4096 cap, not 33%
    assert(8.0 * 1e9 / 4096 < 1e9 / 3 / 100)
    // CANDIDATE-VOLUME-PRESERVING floor past the old 4096-cell cap
    // (r17, the r16 verdict's weak): at the lifted cap's finer cells
    // the floor scales as ceil(8·cells/4096), so the floor point keeps
    // the candidate volume the 0.85 bound was calibrated on. 20M auto
    // cells = 4472 -> 9 probes; 40M auto 6325 -> 13 (the r16 SCALEBENCH
    // equal-work point: recall 0.696 vs the fixed floor's 0.560).
    assert(ivfAutoNprobe(ivfAutoNlist(20_000_000L), 20_000_000L, 10) == 9)
    assert(ivfAutoNprobe(ivfAutoNlist(40_000_000L), 40_000_000L, 10) == 13)
    assert(ivfAutoNprobe(65536, 4_300_000_000L, 10) == 128) // cap point: 8·65536/4096
    // every operating point at or under 4096 cells is UNCHANGED
    assert(Similarity.ivfScaleProbeFloor(4096) == 8)
    assert(Similarity.ivfScaleProbeFloor(346) == 8)
    assert(Similarity.ivfScaleProbeFloor(4097) == 9)
  }

  test("two-level apportionment sums to the budget even when min-1 floors overshoot") {
    import Similarity.apportionCells
    // one huge + nine tiny super-cells at a 12-cell budget: naive min-1
    // floors give 9·1 + 11 = 20 > 12 (the r16 ADVICE overshoot) — the
    // trim takes the excess back from the largest allocation
    val skew = (1 to 9).map(s => s -> 1L).toMap + (0 -> 1000000L)
    val ks = apportionCells(skew, 12)
    assert(ks.values.sum === 12)
    assert(ks.values.forall(_ >= 1))
    assert(ks(0) === 3) // budget minus the nine floors
    // proportional case: exact largest-remainder split, no trim
    val ks2 = apportionCells(Map(0 -> 600L, 1 -> 300L, 2 -> 100L), 10)
    assert(ks2 === Map(0 -> 6, 1 -> 3, 2 -> 1))
    // fractional remainders distribute by largest remainder
    val ks3 = apportionCells(Map(0 -> 500L, 1 -> 300L, 2 -> 200L), 7)
    assert(ks3.values.sum === 7 && ks3(0) >= ks3(1) && ks3(1) >= ks3(2))
    // floor-bound case (more non-empty supers than cells): sums to the
    // super count, every super keeps its 1 cell — documented contract
    val ks4 = apportionCells((0 until 10).map(s => s -> 5L).toMap, 4)
    assert(ks4.values.sum === 10 && ks4.values.forall(_ === 1))
  }

  test("int8 quantization round-trips within the per-element error bound") {
    val vecs = Seq(
      (1L, Array(0.5, -1.0, 0.25, 0.0)),
      (2L, Array(100.0, -50.0, 12.5, 99.9)),
      (3L, Array(1e-4, -1e-4, 0.0, 1e-5))).toDF("id", "v")
    val rt = vecs.select(
      col("id"), col("v"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("v"))).as("r"))
    val rows = rt.collect()
    rows.foreach { row =>
      val v = row.getSeq[Double](1)
      val r = row.getSeq[Double](2)
      val bound = math.max(v.map(math.abs).max / 127.0 / 2.0 * 1.0001, 1e-12)
      v.zip(r).foreach { case (a, b) =>
        assert(math.abs(a - b) <= bound, s"id=${row.getLong(0)}: |$a - $b| > $bound")
      }
    }
    // storage really is tinyint
    val schema = vecs.select(Similarity.quantizeInt8(col("v")).as("q")).schema
    val codesType = schema("q").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]("codes").dataType
    assert(codesType.simpleString == "array<tinyint>")
  }

  test("lsh topk achieves high recall vs brute force") {
    val n = 60
    val vecs = (0 until n).map { i =>
      val base = Array.tabulate(16)(j => math.sin(i * 17 + j * 3).toFloat)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 3)
    val brute = Similarity.cosineTopK(vecs, queries, "vec_id", "embedding", "vec_id", 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshCosineTopK(vecs, queries, "vec_id", "embedding", "vec_id", 5,
        tables = 12, bits = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
    // multi-probe at a HARDER config (fewer tables, finer buckets) must
    // beat — or at least match — the classic probe of the same layout,
    // and clear the same bound: Hamming-1 probing recovers the neighbors
    // that straddle one hyperplane
    val classic = Similarity.lshCosineTopK(vecs, queries, "vec_id", "embedding", "vec_id", 5,
        tables = 4, bits = 6)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val probed = Similarity.lshCosineTopK(vecs, queries, "vec_id", "embedding", "vec_id", 5,
        tables = 4, bits = 6, probes = 6)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val classicRecall = (brute intersect classic).size.toDouble / brute.size
    val probedRecall = (brute intersect probed).size.toDouble / brute.size
    assert(probedRecall >= classicRecall,
      s"multi-probe ($probedRecall) must not lose recall vs classic ($classicRecall)")
    assert(probedRecall >= 0.6, s"multi-probe recall $probedRecall too low")
  }

  test("chunkDocuments windows tokens with overlap, short tail kept") {
    val df = Seq((1L, (1 to 7).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "doc_id", "text", chunkTokens = 3, overlap = 1)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_text", "n_chunk_tokens")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
    // start 6 is skipped: its lone token t7 lies entirely inside chunk 2's
    // overlap region — emitting it would duplicate training text
    assert(out == Seq(
      (0, "t1 t2 t3", 3), (1, "t3 t4 t5", 3), (2, "t5 t6 t7", 3)))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, "doc_id", "text", chunkTokens = 3, overlap = 3)
    }
    // blank documents produce zero chunks, matching tokenCount's blank -> 0
    val blanks = Seq((1L, ""), (2L, "   "), (3L, "one token")).toDF("doc_id", "text")
    val chunked = TextAnalysis.chunkDocuments(blanks, "doc_id", "text", 3, 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(chunked == Seq(3L))
  }

  test("quality filter keeps good docs across languages, drops junk") {
    // ~150-char docs so the length gate passes; zh has no whitespace tokens
    val en = ("the quick brown fox and the lazy dog of the north " * 3).trim
    val zh = "这是一个关于大规模数据处理的中文文档" * 5
    val junk = "!!! ??? *** !!! ??? *** !!! ??? *** " * 5 // punctuation soup
    val df = Seq((1L, en), (2L, zh), (3L, junk)).toDF("doc_id", "text")
    val kept = TextAnalysis.qualityFilter(df, "text", 0.75)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L),
      s"multilingual docs must pass, junk must fail; kept $kept")
  }

  test("corpusDataCard: shares sum to 1, dup/empty counts exact, percentiles interpolate") {
    val df = Seq(
      (1L, "alpha beta gamma", "en"),      // 16 chars, 3 tokens
      (2L, "alpha beta gamma", "en"),      // exact dup of doc 1
      (3L, "delta epsilon", "en"),         // 13 chars, 2 tokens
      (4L, "   ", "en"),                   // empty (0 tokens, 3 chars)
      (5L, "un deux trois quatre", "fr")   // 20 chars, 4 tokens
    ).toDF("doc_id", "text", "lang")
    val card = TextAnalysis.corpusDataCard(df, "text", "lang", exactPercentiles = true)
      .orderBy("lang").collect()
    val en = card(0); val fr = card(1)
    assert(en.getAs[String]("lang") == "en" && fr.getAs[String]("lang") == "fr")
    assert(en.getAs[Long]("n_docs") == 4L && fr.getAs[Long]("n_docs") == 1L)
    assert(en.getAs[Double]("doc_share") == 0.8 && fr.getAs[Double]("doc_share") == 0.2)
    assert(en.getAs[Long]("n_tokens") == 8L && fr.getAs[Long]("n_tokens") == 4L)
    assert(math.abs(en.getAs[Double]("token_share") - 0.666667) < 1e-6)
    assert(en.getAs[Long]("n_exact_dups") == 1L) // docs 1 and 2 share a text
    assert(fr.getAs[Long]("n_exact_dups") == 0L)
    assert(en.getAs[Long]("n_empty") == 1L)
    // en char lengths sorted: 3, 13, 16, 16 — p50 interpolates 13..16
    assert(en.getAs[Double]("p50_chars") == 14.5)
    assert(fr.getAs[Double]("p50_chars") == 20.0)
    // share columns total 1 across languages
    val docShare = card.map(_.getAs[Double]("doc_share")).sum
    val tokShare = card.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(docShare - 1.0) < 1e-6 && math.abs(tokShare - 1.0) < 1e-6)
  }

  test("language scores + quality + token counts behave") {
    val df = Seq(
      (0L, "the cat and the dog of the house is to be seen"),
      (1L, "der hund und die katze ist nicht der erste und der beste")).toDF("doc_id", "text")
    val scored = TextAnalysis.languageScores(df, "text")
    val langs = scored.select("doc_id", "lang_detected").as[(Long, String)].collect().toMap
    assert(langs(0L) == "en")
    assert(langs(1L) == "de")
    val stats = TextAnalysis.textStats(df, "doc_id", "text")
      .select("doc_id", "n_tokens").as[(Long, Int)].collect().toMap
    assert(stats(0L) == 12)
  }

  test("heavy hitters: CMS estimates bound exact counts, deterministic, finds the heavies") {
    // 'alpha' in every doc, 'beta' in half, long tail of unique tokens
    val docs = (1 to 400)
      .map(i => (i.toLong, s"alpha ${if (i % 2 == 0) "beta" else s"rare$i"} tail$i"))
      .toDF("doc_id", "text")
    val hh = TextAnalysis.heavyHittersApprox(docs, "text", k = 2, eps = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(hh.map(_._1).toSeq == Seq("alpha", "beta"), s"got ${hh.toSeq}")
    val n = 1200L // total token occurrences
    val exact = Map("alpha" -> 400L, "beta" -> 200L)
    hh.foreach { case (t, est) =>
      assert(est >= exact(t), s"CMS must never undercount: $t $est")
      assert(est <= exact(t) + (0.01 * n).toLong + 1, s"overcount beyond eps*N: $t $est")
    }
    val again = TextAnalysis.heavyHittersApprox(docs, "text", k = 2, eps = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(again.toSeq == hh.toSeq, "seeded sketch + hash sample must be deterministic")
  }

  test("heavy hitters: sampling is by occurrence, so heavies beat a huge unique tail") {
    // vocabulary (8001 distinct) is much larger than the sample; a
    // value-hash sample would pick ~lowest-hash tokens and almost surely
    // miss 'alpha' — an occurrence sample sees it ~20% of the time
    val docs = (1 to 2000)
      .map(i => (i.toLong, s"alpha u$i v$i w$i x$i"))
      .toDF("doc_id", "text")
    val hh = TextAnalysis.heavyHittersApprox(docs, "text", k = 1, sampleSize = 500)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(hh.head._1 == "alpha", s"got ${hh.toSeq}")
    assert(hh.head._2 >= 2000L, s"CMS never undercounts: ${hh.toSeq}")
  }

  test("zero-norm vectors never reach a cosine top-k (NaN would outrank everything)") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (99L, Array(0.0f, 0.0f)) // the zero embedding
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(corpus, q, "vec_id", "embedding", "vec_id", k = 3)
      .select("vec_id").as[Long].collect()
    assert(!top.contains(99L), s"zero vector polluted top-k: ${top.toSeq}")
    assert(top.toSet == Set(1L, 2L))
    // a zero QUERY returns no rows rather than k arbitrary NaN-ranked ids
    val zq = Seq((101L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(Similarity.cosineTopK(corpus, zq, "vec_id", "embedding", "vec_id", 3).count() == 0)
    // mismatched id types fail loudly instead of silently returning empty
    val sq = Seq(("q1", Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.cosineTopK(corpus, sq, "vec_id", "embedding", "vec_id", 3)
    }
    // lossless numeric widening (int query id vs long corpus id) is fine:
    // the = / =!= comparison widens without nulling out
    val iq = Seq((100, Array(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val widened = Similarity.cosineTopK(corpus, iq, "vec_id", "embedding", "vec_id", 2)
      .select("vec_id").as[Long].collect()
    assert(widened.toSet == Set(1L, 2L))
  }

  test("id-type guard accepts exact cross-family widenings, rejects lossy ones") {
    val mk = (t: String) => Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding").withColumn("vec_id", col("vec_id").cast(t))
    val q = (t: String) => Seq((100L, Array(1.0f, 0.05f)))
      .toDF("vec_id", "embedding").withColumn("vec_id", col("vec_id").cast(t))
    def topIds(c: org.apache.spark.sql.DataFrame, qd: org.apache.spark.sql.DataFrame) =
      Similarity.cosineTopK(c, qd, "vec_id", "embedding", "vec_id", 2)
        .select(col("vec_id").cast("long")).as[Long].collect().toSet
    // decimal↔decimal of different precision: exact widened comparison
    assert(topIds(mk("decimal(10,0)"), q("decimal(12,0)")) == Set(1L, 2L))
    // decimal↔integral within the cap, and int↔double (exact in 52 bits)
    assert(topIds(mk("decimal(10,0)"), q("int")) == Set(1L, 2L))
    assert(topIds(mk("int"), q("double")) == Set(1L, 2L))
    // short↔float is exact in a 24-bit mantissa
    assert(topIds(mk("short"), q("float")) == Set(1L, 2L))
    // int↔float and long↔double are LOSSY — rejected loudly
    intercept[IllegalArgumentException] { topIds(mk("int"), q("float")) }
    intercept[IllegalArgumentException] { topIds(mk("long"), q("double")) }
    // decimal whose widened comparison would overflow the precision cap
    intercept[IllegalArgumentException] {
      topIds(mk("decimal(38,0)"), q("decimal(38,10)"))
    }
    // and the original failure mode stays rejected
    intercept[IllegalArgumentException] { topIds(mk("string"), q("long")) }
  }

  test("RRF fusion: consensus items outrank single-ranker items; ties break by id") {
    // item 10 is rank 2 in both rankings; item 11 is rank 1 in one only.
    // 1/62 + 1/62 > 1/61, so consensus wins despite the worse best-rank.
    val lex = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val vec = Seq((1L, 13L, 1), (1L, 10L, 2), (1L, 14L, 3))
      .toDF("query_id", "doc_id", "rank")
    val fused = Similarity.rrfFuse(Seq(lex, vec), "doc_id", k0 = 60, k = 10)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(fused.head === ((10L, 1)), s"consensus item must lead: ${fused.toSeq}")
    // 11 and 13 are both solo rank-1 (equal score 1/61): id breaks the tie
    assert(fused.slice(1, 3).map(_._1).toSeq === Seq(11L, 13L))
    // every input item appears exactly once
    assert(fused.map(_._1).toSet === Set(10L, 11L, 12L, 13L, 14L))
  }

  test("ranking metrics grade a real searchIvf + rrfFuse pipeline end to end") {
    import graft.similarity.AnnIndex
    import graft.eval.Metrics
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_rank_ivf").toString
    AnnIndex.buildIvf(emb, "vec_id", "embedding", dir, nlist = 8, seed = 7L)
    // clone queries (shifted ids so self-exclusion never bites)
    val queries = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    // labels = graded truth from the EXACT brute-force top-3 (rel 3/2/1)
    val relevance = Similarity
      .cosineTopK(emb, queries, "vec_id", "embedding", "vec_id", 3)
      .select(col("query_id"), col("vec_id"), (lit(4) - col("rank")).as("rel"))
    // the served pipeline under evaluation: exhaustive-probe IVF search
    // fused with the brute ranking via RRF — both exact, so the fused
    // order equals the ideal order and every metric hits its ceiling
    val ivfHits = AnnIndex.searchIvf(spark, dir, queries, "vec_id",
      "embedding", k = 10, nprobe = 8)
    val brute = Similarity
      .cosineTopK(emb, queries, "vec_id", "embedding", "vec_id", 10)
    val fused = Similarity.rrfFuse(Seq(ivfHits, brute), "vec_id", k0 = 60, k = 10)
    val perQ = Metrics.rankingMetrics(fused, relevance,
      "query_id", "vec_id", "rank", "rel", k = 10)
    val rows = perQ.collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getAs[Double]("ndcg") === 1.0, s"exact retrieval must score ndcg 1: $r")
      assert(r.getAs[Double]("recall_at_k") === 1.0)
      assert(r.getAs[Double]("reciprocal_rank") === 1.0)
      assert(r.getAs[Double]("precision_at_k") === 0.3) // 3 relevant of k=10
      // all 3 relevant at ranks 1..3: AP = (1/1 + 2/2 + 3/3) / 3 = 1
      assert(r.getAs[Double]("average_precision") === 1.0)
      assert(r.getAs[Long]("n_relevant") === 3L)
    }
    val s = Metrics.rankingMetricsSummary(perQ).head()
    assert(s.getAs[Long]("n_queries") === 8L && s.getAs[Long]("n_labeled") === 8L)
    assert(s.getAs[Double]("mrr") === 1.0 && s.getAs[Double]("mean_ndcg") === 1.0)
    assert(s.getAs[Double]("mean_ap") === 1.0)
    // a degraded ranker (the same list REVERSED) is strictly worse on
    // ndcg and rr — the metric actually separates good from bad serving
    val reversed = fused.withColumn("rank", lit(11) - col("rank"))
    val worse = Metrics.rankingMetrics(reversed, relevance,
      "query_id", "vec_id", "rank", "rel", k = 10).collect()
    worse.foreach { r =>
      assert(r.getAs[Double]("ndcg") < 1.0 && r.getAs[Double]("reciprocal_rank") < 1.0)
      assert(r.getAs[Double]("average_precision") < 1.0) // relevant pushed deep
      assert(r.getAs[Double]("recall_at_k") === 1.0) // same set, worse order
    }
  }

  test("sharded probe compensation: r19-gated points bit-identical, log2 ramp past S=4") {
    import graft.similarity.{AnnIndex, Similarity}
    // S <= 4 resolves to the r19-calibrated constant 2 EXACTLY — the
    // decade gate (pq-sharded-decade) re-runs against these values, so a
    // drift here silently invalidates its history
    Seq(1, 2, 3, 4).foreach(s =>
      assert(Similarity.shardedProbeCompensation(s) === 2, s"S=$s"))
    // the r20 shard-sweep calibration: ceil(log2 S) past 4 (needed
    // multipliers measured ~2 / ~2.6 / ~3.5 at S = 4 / 8 / 16)
    assert(Similarity.shardedProbeCompensation(5) === 3)
    assert(Similarity.shardedProbeCompensation(8) === 3)
    assert(Similarity.shardedProbeCompensation(16) === 4)
    assert(Similarity.shardedProbeCompensation(32) === 5)
    assert(Similarity.shardedProbeCompensation(64) === 6)
    // monotone in S: more shards never probe LESS per shard
    (2 to 64).sliding(2).foreach { w =>
      assert(Similarity.shardedProbeCompensation(w(0)) <=
        Similarity.shardedProbeCompensation(w(1)))
    }
    // shardNprobe wires the compensation: min(nlist, comp(S) x the
    // single-index auto policy), explicit nprobe untouched
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_shardnp").toString
    AnnIndex.buildIvfSharded(emb, "vec_id", "embedding", dir, nShards = 2, nlist = 8)
    val sd = s"$dir/shard=0"
    val sm = spark.read.parquet(s"$sd/meta.parquet").head()
    val auto = Similarity.ivfAutoNprobe(
      sm.getAs[Int]("nlist"), sm.getAs[Long]("n_rows"), 10)
    assert(AnnIndex.shardNprobe(spark, sd, "ivf", 10, 0, 2) ===
      math.min(sm.getAs[Int]("nlist"), 2 * auto))
    assert(AnnIndex.shardNprobe(spark, sd, "ivf", 10, 0, 16) ===
      math.min(sm.getAs[Int]("nlist"), 4 * auto))
    assert(AnnIndex.shardNprobe(spark, sd, "ivf", 10, 3, 16) === 3,
      "explicit nprobe must pass through untouched")
  }

  test("ranking metrics: hand-computed AP and the duplicate-label fold") {
    import graft.eval.Metrics
    // query 1: relevant b (rank 2) and d (rank 4) retrieved, e unretrieved
    //   AP = (1/2 + 2/4) / 3 relevant = 0.333333; rr = 1/2
    // query 2: retrieved but zero-relevant -> null ndcg/recall/ap, p@k 0
    val results = Seq(
      (1L, "a", 1), (1L, "b", 2), (1L, "c", 3), (1L, "d", 4),
      (2L, "a", 1), (2L, "b", 2)).toDF("query_id", "cand_id", "rank")
    // b is labeled TWICE (0 then 1): the fold must keep max(rel) = 1 and
    // count b once in n_relevant, not fan the join into double dcg
    val relevance = Seq(
      (1L, "b", 0.0), (1L, "b", 1.0), (1L, "d", 2.0), (1L, "e", 1.0))
      .toDF("query_id", "cand_id", "rel")
    val rows = Metrics.rankingMetrics(results, relevance,
        "query_id", "cand_id", "rank", "rel", k = 10)
      .orderBy(col("query_id")).collect()
    val q1 = rows(0)
    assert(q1.getAs[Long]("n_relevant") === 3L, "dup label must fold, not inflate")
    assert(q1.getAs[Long]("n_retrieved") === 4L, "dup label must not fan the join")
    assert(q1.getAs[Double]("average_precision") === 0.333333)
    assert(q1.getAs[Double]("reciprocal_rank") === 0.5)
    assert(q1.getAs[Double]("recall_at_k") === 0.666667)
    assert(q1.getAs[Double]("precision_at_k") === 0.2)
    // dcg = 1/log2(3) for b(rel 1 @2) + 3/log2(5) for d(rel 2 @4)
    val expDcg = BigDecimal(1.0 / (math.log(3) / math.log(2)) +
      3.0 / (math.log(5) / math.log(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(q1.getAs[Double]("dcg") === expDcg)
    val q2 = rows(1)
    assert(q2.isNullAt(q2.fieldIndex("ndcg")) &&
      q2.isNullAt(q2.fieldIndex("recall_at_k")) &&
      q2.isNullAt(q2.fieldIndex("average_precision")),
      "zero-relevant 0/0 metrics are undefined, not zero")
    assert(q2.getAs[Double]("precision_at_k") === 0.0 &&
      q2.getAs[Double]("reciprocal_rank") === 0.0)
    // the summary conventions: mean_ap/ndcg/recall skip the unlabeled
    // query, mrr and precision include it as 0
    val s = Metrics.rankingMetricsSummary(
      Metrics.rankingMetrics(results, relevance,
        "query_id", "cand_id", "rank", "rel", k = 10)).head()
    assert(s.getAs[Long]("n_queries") === 2L && s.getAs[Long]("n_labeled") === 1L)
    assert(s.getAs[Double]("mean_ap") === 0.333333)
    assert(s.getAs[Double]("mrr") === 0.25)       // (0.5 + 0) / 2
    assert(s.getAs[Double]("mean_precision_at_k") === 0.1) // (0.2 + 0) / 2
  }

  test("lexical Jaccard top-k: exact overlap arithmetic, self excluded") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),   // 2 of 4 distinct tokens shared with q=1
      (3L, "alpha zeta eta"),     // 1 of 5 shared
      (4L, "iota kappa mu")       // nothing shared
    ).toDF("doc_id", "text")
    val top = TextAnalysis.lexicalJaccardTopK(
        docs, docs.filter(col("doc_id") === 1), "doc_id", "text", "doc_id", k = 5)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // jaccard(1,2) = 2/4, jaccard(1,3) = 1/5; doc 4 has no candidate row;
    // doc 1 (the query itself) is excluded
    assert(top.toSeq === Seq((2L, 0.5), (3L, 0.2)))
    // ranking rides the bounded-heap aggregate: each map partition ships
    // <= k candidates per query, never the full candidate frame through a
    // Window sort (the hybrid RRF hot path calls this)
    val plan = TextAnalysis.lexicalJaccardTopK(
        docs, docs.filter(col("doc_id") === 1), "doc_id", "text", "doc_id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_top_k") && !plan.contains("Window"),
      s"candidates must reduce map-side:\n$plan")
  }

  test("lexical Jaccard rejects query ids that coerce lossily vs corpus ids") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val qStr = docs.limit(1)
      .select(col("doc_id").cast("string").as("doc_id"), col("text"))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.lexicalJaccardTopK(docs, qStr, "doc_id", "text", "doc_id", k = 3)
    }
    assert(e.getMessage.contains("doc_id"))
  }

  test("multimodal resize updates metadata, preserves asset schema and payload") {
    val assets = Multimodal.toAssets(
      Seq((1L, "img-bytes")).toDF("id", "b").withColumn("b", col("b").cast("binary")),
      "id", "b", "image")
    val resized = Multimodal.resizeStub(assets, 224, 224)
    // same field names and types (nullability may tighten: literals are
    // non-null, which any downstream consumer accepts)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    assert(shape(resized) == shape(assets))
    val r = resized.select("meta.width", "meta.height", "payload").head()
    assert(r.getInt(0) == 224 && r.getInt(1) == 224)
    assert(new String(r.getAs[Array[Byte]](2)) == "img-bytes") // payload untouched
    // audio assets pass through with their meta unchanged (no fabricated dims)
    val audio = Multimodal.toAssets(
      Seq((2L, "wav-bytes")).toDF("id", "b").withColumn("b", col("b").cast("binary")),
      "id", "b", "audio")
    val a = Multimodal.resizeStub(audio, 224, 224).select("meta.width").head()
    assert(a.isNullAt(0), "audio meta must not get fabricated dimensions")
  }

  test("multimodal: real ImageIO decode — dims, channels, channel means, junk -> null") {
    // render a 4x2 PNG in-memory with known pixels: left half red, right blue
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val assets = Multimodal.toAssets(
      Seq((1L, buf.toByteArray), (2L, "not an image".getBytes("UTF-8")))
        .toDF("id", "b"),
      "id", "b", "image")
    val out = Multimodal.imageStats(assets)
      .select("asset_id", "img.width", "img.height", "img.channels",
        "img.mean_r", "img.mean_g", "img.mean_b", "decoded")
      .orderBy("asset_id").collect()
    val good = out(0)
    assert(good.getInt(1) == 4 && good.getInt(2) == 2)
    assert(good.getInt(3) == 3) // RGB raster
    // half red half blue: mean_r = mean_b = 127.5, mean_g = 0
    assert(good.getDouble(4) == 127.5 && good.getDouble(5) == 0.0 && good.getDouble(6) == 127.5)
    assert(good.getBoolean(7))
    // junk bytes: null stats, decoded = false — the validity filter
    assert(out(1).isNullAt(1) && !out(1).getBoolean(7))
    // audio rows skip the decode attempt entirely
    val audio = Multimodal.toAssets(
      Seq((3L, buf.toByteArray)).toDF("id", "b"), "id", "b", "audio")
    assert(Multimodal.imageStats(audio).select("img").head().isNullAt(0))
    // the SQL surface sees the same kernel
    assets.createOrReplaceTempView("assets_t")
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_image_stats(payload).width FROM assets_t WHERE asset_id = 1").head()
    assert(viaSql.getInt(0) == 4)
  }

  test("multimodal: real javax.sound WAV decode — rate, frames, duration, RMS; junk -> null") {
    // synthesize a 100 ms 8 kHz mono 16-bit WAV of constant amplitude
    // 16384 = half full scale, so RMS is exactly 0.5
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val nFrames = 800
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) { pcm(2 * i) = 0x00; pcm(2 * i + 1) = 0x40; i += 1 }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val assets = Multimodal.toAssets(
      Seq((1L, buf.toByteArray), (2L, "not audio".getBytes("UTF-8"))).toDF("id", "b"),
      "id", "b", "audio")
    val out = Multimodal.audioStats(assets)
      .select("asset_id", "audio.sample_rate", "audio.channels", "audio.bits",
        "audio.n_frames", "audio.duration_ms", "audio.rms", "audio_decoded")
      .orderBy("asset_id").collect()
    val good = out(0)
    assert(good.getInt(1) == 8000 && good.getInt(2) == 1 && good.getInt(3) == 16)
    assert(good.getLong(4) == 800 && good.getLong(5) == 100)
    assert(good.getDouble(6) == 0.5)
    assert(good.getBoolean(7))
    // junk bytes: null stats, audio_decoded = false — the validity filter
    assert(out(1).isNullAt(1) && !out(1).getBoolean(7))
    // image rows skip the audio decode attempt entirely
    val img = Multimodal.toAssets(
      Seq((3L, buf.toByteArray)).toDF("id", "b"), "id", "b", "image")
    assert(Multimodal.audioStats(img).select("audio").head().isNullAt(0))
    // the SQL surface sees the same kernel
    assets.createOrReplaceTempView("audio_t")
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_audio_stats(payload).sample_rate FROM audio_t WHERE asset_id = 1").head()
    assert(viaSql.getInt(0) == 8000)
  }

  test("multimodal: real MP4/AVI container parse — brand, duration, tracks, dims; junk -> null") {
    def be32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def le32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()
    def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // ISO BMFF box: [u32 BE size incl. header][4cc][payload]
    def mp4box(typ: String, payload: Array[Byte]): Array[Byte] =
      cat(be32(payload.length + 8L), fcc(typ), payload)

    // a minimal-but-well-formed MP4: ftyp(isom) + moov{mvhd(v0,
    // timescale 1000, duration 5000), video trak(640x360 as 16.16
    // fixed), audio trak(0x0)}
    val mvhd = mp4box("mvhd",
      cat(new Array[Byte](4), be32(0), be32(0), be32(1000), be32(5000),
        new Array[Byte](80)))
    def tkhd(w: Int, h: Int) = mp4box("tkhd",
      cat(new Array[Byte](76), be32(w.toLong << 16), be32(h.toLong << 16)))
    val moov = mp4box("moov",
      cat(mvhd, mp4box("trak", tkhd(640, 360)), mp4box("trak", tkhd(0, 0))))
    val mp4 = cat(
      mp4box("ftyp", cat(fcc("isom"), be32(0), fcc("mp42"))), moov)

    // a minimal AVI: RIFF/AVI + LIST hdrl { avih } — 33333 us/frame x
    // 300 frames (= 9999 ms), 2 streams, 1280x720
    val avih = cat(fcc("avih"), le32(56),
      le32(33333), le32(0), le32(0), le32(0), le32(300), le32(0), le32(2),
      le32(0), le32(1280), le32(720), new Array[Byte](16))
    val hdrl = cat(fcc("LIST"), le32(4L + avih.length), fcc("hdrl"), avih)
    val avi = cat(fcc("RIFF"), le32(4L + hdrl.length), fcc("AVI "), hdrl)

    val assets = Multimodal.toAssets(
      Seq((1L, mp4), (2L, avi), (3L, "not a video".getBytes("UTF-8")))
        .toDF("id", "b"),
      "id", "b", "video")
    val out = Multimodal.videoStats(assets)
      .select("asset_id", "video.container", "video.brand", "video.duration_ms",
        "video.n_tracks", "video.width", "video.height", "video_parsed")
      .orderBy("asset_id").collect()
    val m = out(0)
    assert(m.getString(1) == "mp4" && m.getString(2) == "isom")
    assert(m.getLong(3) == 5000 && m.getInt(4) == 2)
    assert(m.getInt(5) == 640 && m.getInt(6) == 360)
    assert(m.getBoolean(7))
    val a = out(1)
    assert(a.getString(1) == "avi" && a.isNullAt(2))
    assert(a.getLong(3) == 9999 && a.getInt(4) == 2)
    assert(a.getInt(5) == 1280 && a.getInt(6) == 720)
    assert(a.getBoolean(7))
    // junk bytes: null struct, video_parsed = false — the validity filter
    assert(out(2).isNullAt(1) && !out(2).getBoolean(7))
    // image rows skip the parse attempt entirely
    val img = Multimodal.toAssets(Seq((4L, mp4)).toDF("id", "b"), "id", "b", "image")
    assert(Multimodal.videoStats(img).select("video").head().isNullAt(0))
    // a truncated/corrupt size field stops the walk instead of looping
    val corrupt = cat(be32(0xffffffffL), fcc("ftyp"), fcc("isom"))
    val c = Multimodal.videoStats(Multimodal.toAssets(
      Seq((5L, corrupt)).toDF("id", "b"), "id", "b", "video"))
      .select("video").head()
    assert(c.isNullAt(0))
    // the SQL surface sees the same kernel
    assets.createOrReplaceTempView("video_t")
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_video_meta(payload).duration_ms FROM video_t WHERE asset_id = 2").head()
    assert(viaSql.getLong(0) == 9999)
  }

  test("multimodal: MP4 sample-table frame index — offsets, sizes, pts, keyframes") {
    def be32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array()
    def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def mp4box(typ: String, payload: Array[Byte]): Array[Byte] =
      cat(be32(payload.length + 8L), fcc(typ), payload)
    // video track sample tables, hand-computed ground truth:
    //   chunk 1 @ offset 1000: samples 1,2 (sizes 10, 20)
    //   chunk 2 @ offset 2000: sample 3 (size 30)
    //   stts: one run (3 samples, delta 100), mdhd timescale 1000
    //     -> pts 0, 100, 200 ms
    //   stss: samples 1 and 3 are keyframes
    val stts = mp4box("stts", cat(be32(0), be32(1), be32(3), be32(100)))
    val stsz = mp4box("stsz", cat(be32(0), be32(0), be32(3),
      be32(10), be32(20), be32(30)))
    val stsc = mp4box("stsc", cat(be32(0), be32(2),
      be32(1), be32(2), be32(1),   // from chunk 1: 2 samples per chunk
      be32(2), be32(1), be32(1)))  // from chunk 2: 1 sample per chunk
    val stco = mp4box("stco", cat(be32(0), be32(2), be32(1000), be32(2000)))
    val stss = mp4box("stss", cat(be32(0), be32(2), be32(1), be32(3)))
    val stbl = mp4box("stbl", cat(stts, stsz, stsc, stco, stss))
    val minf = mp4box("minf", stbl)
    val mdhd = mp4box("mdhd",
      cat(new Array[Byte](4), be32(0), be32(0), be32(1000), be32(300)))
    val hdlr = mp4box("hdlr", cat(new Array[Byte](8), fcc("vide"),
      new Array[Byte](12)))
    val mdia = mp4box("mdia", cat(mdhd, hdlr, minf))
    val trak = mp4box("trak", mdia)
    val mvhd = mp4box("mvhd",
      cat(new Array[Byte](4), be32(0), be32(0), be32(1000), be32(300),
        new Array[Byte](80)))
    val mp4 = cat(
      mp4box("ftyp", cat(fcc("isom"), be32(0), fcc("mp42"))),
      mp4box("moov", cat(mvhd, trak)))

    val assets = Multimodal.toAssets(
      Seq((1L, mp4)).toDF("id", "b"), "id", "b", "video")
    val frames = assets
      .select(col("asset_id"),
        explode(Multimodal.decodeFrameIndex(col("payload"))).as("f"))
      .select("f.idx", "f.offset", "f.size", "f.pts_ms", "f.sync")
      .orderBy("f.idx")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    assert(frames.toSeq === Seq(
      (0, 1000L, 10, 0L, true),
      (1, 1010L, 20, 100L, false),   // second sample in chunk 1: 1000+10
      (2, 2000L, 30, 200L, true)))
    // keyframe range table keeps only sync samples
    val kf = Multimodal.keyframeRanges(assets)
      .orderBy("idx").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(kf.toSeq === Seq((0, 1000L), (2, 2000L)))
    // maxSamples cap truncates deterministically
    val capped = assets.select(
      explode(Multimodal.decodeFrameIndex(col("payload"), maxSamples = 2)).as("f"))
    assert(capped.count() === 2)
    // audio-only MP4 (no 'vide' handler) -> null index
    val hdlrAud = mp4box("hdlr", cat(new Array[Byte](8), fcc("soun"),
      new Array[Byte](12)))
    val audio = cat(
      mp4box("ftyp", cat(fcc("isom"), be32(0), fcc("mp42"))),
      mp4box("moov", cat(mvhd,
        mp4box("trak", mp4box("mdia", cat(mdhd, hdlrAud, minf))))))
    val aRow = Multimodal.toAssets(Seq((2L, audio)).toDF("id", "b"), "id", "b", "video")
      .select(Multimodal.decodeFrameIndex(col("payload")).as("f")).head()
    assert(aRow.isNullAt(0))
    // SQL surface sees the same kernel, cap enforced as a literal
    assets.createOrReplaceTempView("mp4_t")
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT size(graft_mp4_frames(payload)) FROM mp4_t").head().getInt(0)
    assert(viaSql === 3)
    assert(spark.sql(
      "SELECT size(graft_mp4_frames(payload, 1)) FROM mp4_t").head().getInt(0) === 1)

    // co64 (64-bit chunk offsets) resolves the same frame locations
    def be64(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(v).array()
    val co64 = mp4box("co64", cat(be32(0), be32(2), be64(1000L), be64(2000L)))
    val stblCo64 = mp4box("stbl", cat(stts, stsz, stsc, co64, stss))
    val mp4Co64 = cat(
      mp4box("ftyp", cat(fcc("isom"), be32(0), fcc("mp42"))),
      mp4box("moov", cat(mvhd, mp4box("trak", mp4box("mdia",
        cat(mdhd, hdlr, mp4box("minf", stblCo64)))))))
    val co64Frames = Multimodal.toAssets(Seq((9L, mp4Co64)).toDF("id", "b"), "id", "b", "video")
      .select(explode(Multimodal.decodeFrameIndex(col("payload"))).as("f"))
      .select("f.offset").orderBy("f.offset").collect().map(_.getLong(0))
    assert(co64Frames.toSeq === Seq(1000L, 1010L, 2000L))

    // corrupt tables fail to null, never throw or loop: stsz promising
    // more samples than its size array, and a zero mdhd timescale
    val stszShort = mp4box("stsz", cat(be32(0), be32(0), be32(99), be32(10)))
    val corruptTables = cat(
      mp4box("ftyp", cat(fcc("isom"), be32(0), fcc("mp42"))),
      mp4box("moov", cat(mvhd, mp4box("trak", mp4box("mdia",
        cat(mdhd, hdlr, mp4box("minf", mp4box("stbl", cat(stts, stszShort, stsc, stco)))))))))
    val zeroTs = mp4box("mdhd",
      cat(new Array[Byte](4), be32(0), be32(0), be32(0), be32(300)))
    val corruptMdhd = cat(
      mp4box("ftyp", cat(fcc("isom"), be32(0), fcc("mp42"))),
      mp4box("moov", cat(mvhd, mp4box("trak", mp4box("mdia",
        cat(zeroTs, hdlr, mp4box("minf", stbl)))))))
    Seq(corruptTables, corruptMdhd).zipWithIndex.foreach { case (bytes, i) =>
      val r = Multimodal.toAssets(Seq((100L + i, bytes)).toDF("id", "b"), "id", "b", "video")
        .select(Multimodal.decodeFrameIndex(col("payload")).as("f")).head()
      assert(r.isNullAt(0), s"corrupt container $i must yield null, not a frame index")
    }

    // a defective FIRST video trak (stbl missing / zero timescale) must not
    // mask a valid second one — the trak loop skips it and keeps going
    val mdiaNoStbl = mp4box("mdia", cat(mdhd, hdlr, mp4box("minf", Array.empty[Byte])))
    val mdiaZeroTs = mp4box("mdia", cat(zeroTs, hdlr, minf))
    Seq(mdiaNoStbl, mdiaZeroTs).zipWithIndex.foreach { case (badMdia, i) =>
      val twoTrak = cat(
        mp4box("ftyp", cat(fcc("isom"), be32(0), fcc("mp42"))),
        mp4box("moov", cat(mvhd, mp4box("trak", badMdia), trak)))
      val rescued = Multimodal.toAssets(
        Seq((200L + i, twoTrak)).toDF("id", "b"), "id", "b", "video")
        .select(explode(Multimodal.decodeFrameIndex(col("payload"))).as("f"))
      assert(rescued.count() === 3,
        s"valid second video trak must be used when the first is defective (case $i)")
    }
  }

  test("multimodal: REAL MJPEG-in-AVI frame decode — known pixels, ranges, codec gating") {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      cat(fcc(id), le32(data.length), data,
        if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", cat(fcc(listType), children))
    def jpeg(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val red = jpeg(0xff0000, 8, 6)
    val blue = jpeg(0x0000ff, 4, 4)
    def avi(handler: String, frames: Array[Byte]*): Array[Byte] = {
      // avih (AVIMAINHEADER): usPerFrame=40000, then 10xu32 layout with
      // totalFrames, streams, width, height at their published offsets
      val avih = chunk("avih", cat(le32(40000), le32(0), le32(0), le32(0),
        le32(frames.length), le32(0), le32(1), le32(0), le32(8), le32(6),
        new Array[Byte](16)))
      val strh = chunk("strh", cat(fcc("vids"), fcc(handler), new Array[Byte](48)))
      val hdrl = list("hdrl", cat(avih, list("strl", strh)))
      val movi = list("movi", cat(frames.map(f => chunk("00dc", f)): _*))
      val body = cat(fcc("AVI "), hdrl, movi)
      cat(fcc("RIFF"), le32(body.length), body)
    }
    val good = avi("MJPG", red, blue)
    val assets = Multimodal.toAssets(Seq((1L, good)).toDF("id", "b"), "id", "b", "video")
    val frames = Multimodal.mjpegFrameStats(assets).orderBy("idx").collect()
    assert(frames.length === 2, "both MJPEG frames must decode")
    val r0 = frames(0)
    assert((r0.getAs[Int]("width"), r0.getAs[Int]("height")) === (8, 6))
    assert(math.abs(r0.getAs[Double]("mean_r") - 255.0) < 10 &&
      r0.getAs[Double]("mean_g") < 10 && r0.getAs[Double]("mean_b") < 10,
      s"red frame pixels must decode red: $r0")
    val r1 = frames(1)
    assert((r1.getAs[Int]("width"), r1.getAs[Int]("height")) === (4, 4))
    assert(math.abs(r1.getAs[Double]("mean_b") - 255.0) < 10 &&
      r1.getAs[Double]("mean_r") < 10, s"blue frame pixels must decode blue: $r1")
    // byte ranges point at the exact JPEG bytes inside the container
    frames.zip(Seq(red, blue)).foreach { case (f, j) =>
      val off = f.getAs[Long]("offset").toInt
      val sz = f.getAs[Int]("size")
      assert(sz === j.length &&
        java.util.Arrays.equals(java.util.Arrays.copyOfRange(good, off, off + sz), j),
        "frame byte range must slice to the original JPEG")
    }
    // codec gating: a non-MJPEG vids stream yields null (no fake decode)
    val h264 = Multimodal.toAssets(
      Seq((2L, avi("H264", red))).toDF("id", "b"), "id", "b", "video")
    assert(h264.select(Multimodal.decodeAviMjpegFrames(col("payload")).as("f"))
      .head().isNullAt(0))
    // an undecodable chunk is skipped, valid frames still come back
    val mixed = Multimodal.toAssets(
      Seq((3L, avi("MJPG", Array.fill[Byte](16)(0x55), blue))).toDF("id", "b"),
      "id", "b", "video")
    val mixedFrames = mixed.select(explode(Multimodal.decodeAviMjpegFrames(col("payload"))).as("f"))
      .select("f.width").collect().map(_.getInt(0))
    assert(mixedFrames.toSeq === Seq(4), "junk chunk skipped, valid frame decoded")
    // graft_video_meta on the same fixture is untouched by the new path
    val meta = Multimodal.videoStats(assets).select("video.container", "video.duration_ms",
      "video.width", "video.height").head()
    assert(meta.getString(0) === "avi" && meta.getLong(1) === 80L &&
      meta.getInt(2) === 8 && meta.getInt(3) === 6)
    // SQL parity function
    assets.createOrReplaceTempView("avi_t")
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT size(graft_avi_mjpeg_frames(payload)) FROM avi_t")
      .head().getInt(0) === 2)
    assert(spark.sql("SELECT size(graft_avi_mjpeg_frames(payload, 1)) FROM avi_t")
      .head().getInt(0) === 1)
  }

  test("multimodal: payload stats real, stub features deterministic") {
    val assets = Multimodal.toAssets(
      Seq((1L, "payload-bytes-one"), (2L, "payload-bytes-two"))
        .toDF("id", "b").withColumn("b", col("b").cast("binary")),
      "id", "b", "image")
    val f1 = Multimodal.extractFeatures(assets, dim = 4).select("asset_id", "features").collect()
    val f2 = Multimodal.extractFeatures(assets, dim = 4).select("asset_id", "features").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq) // deterministic
    val stats = Multimodal.payloadStats(assets).select("payload_bytes").as[Int].collect()
    assert(stats.forall(_ == 17))
  }

  test("hardNegatives: labeled positives excluded, self excluded, ranks contiguous") {
    // 1-d directions on a circle: neighbors ordered by angle
    def unitAt(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val corpus = (0 until 20).map(i => (i.toLong, unitAt(i * 4.0)))
      .toDF("id", "vec")
    val queries = corpus.filter($"id" === 0L)
    // the two angular neighbors are the labeled positives
    val pos = Seq((0L, 1L), (0L, 2L)).toDF("qid", "pid")
    val out = Similarity.hardNegatives(corpus, queries, pos,
      "id", "vec", "id", k = 5, nlist = 4, nprobe = 4)
      .collect()
    val ids = out.map(_.getAs[Long]("id")).toSet
    assert(!ids.contains(0L) && !ids.contains(1L) && !ids.contains(2L))
    // with self and the two positives gone, the closest survivors lead
    assert(out.length === 5)
    assert(out.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3, 4, 5))
    assert(out.minBy(_.getAs[Int]("rank")).getAs[Long]("id") === 3L)
    // malformed positives frame fails loudly
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(corpus, queries,
        Seq((0L, 1L, 2L)).toDF("a", "b", "c"), "id", "vec", "id", k = 5)
    }
  }

  test("scriptProfile: dominance, mixed flag, empty text") {
    val d = Seq(
      (1L, "中文文本"),                          // pure han
      (2L, "hello world привет"),               // latin dominant, mixed
      (3L, ""),                                 // nothing
      (4L, "한국어"),                           // pure hangul
      (5L, "mostly latin text with one я")      // tiny tail below 5%
    ).toDF("id", "text")
    val out = TextAnalysis.scriptProfile(d, "id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("dominant_script") === "han")
    assert(out(1L).getAs[Double]("dominant_frac") === 1.0)
    assert(!out(1L).getAs[Boolean]("script_mixed"))
    assert(out(2L).getAs[String]("dominant_script") === "latin")
    assert(out(2L).getAs[Boolean]("script_mixed"))
    assert(out(2L).getAs[Long]("n_cyrillic") === 6L)
    assert(out(3L).isNullAt(out(3L).fieldIndex("dominant_script")))
    assert(!out(3L).getAs[Boolean]("script_mixed"))
    assert(out(4L).getAs[String]("dominant_script") === "hangul")
    // 1 cyrillic char over 23 latin -> 1/24 ≈ 4.2% < 5% -> not mixed
    assert(!out(5L).getAs[Boolean]("script_mixed"))
  }

  test("rougeL: hand-computed LCS cases — reorder, subsequence, disjoint, empty") {
    def toks(s: String) = split(trim(lower(lit(s))), "\\s+")
    val out = Seq(1).toDF("x").select(
      graft.dedup.Dedup.rougeL(toks("a b c d"), toks("a b c d")).as("same"),
      graft.dedup.Dedup.rougeL(toks("a b c d"), toks("b a c d")).as("reorder"),
      graft.dedup.Dedup.rougeL(toks("a b c d e"), toks("b d e")).as("subseq"),
      graft.dedup.Dedup.rougeL(toks("a b c"), toks("x y z")).as("disjoint"),
      graft.dedup.Dedup.rougeL(toks("a b"), toks("b a")).as("swap")
    ).head()
    assert(out.getAs[Double]("same") === 1.0)
    // LCS(abcd, bacd) = 3 ("a c d" or "b c d") -> 2*3/8
    assert(out.getAs[Double]("reorder") === 0.75)
    // "b d e" is a subsequence -> LCS 3 -> 2*3/8
    assert(out.getAs[Double]("subseq") === 0.75)
    assert(out.getAs[Double]("disjoint") === 0.0)
    // LCS(ab, ba) = 1 -> 2*1/4
    assert(out.getAs[Double]("swap") === 0.5)
  }

  test("rougeLNearDupPairs: copies and near-copies found, verified scores, truncation") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val d = Seq(
      (1L, base),
      (2L, base),                                             // exact copy
      (3L, "bravo alpha charlie delta echo foxtrot golf hotel india juliet"), // 2 swapped
      (4L, "kilo lima mike november oscar papa quebec romeo sierra tango")
    ).toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup
      .rougeLNearDupPairs(d, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("rouge_l")).toMap
    assert(pairs((1L, 2L)) === 1.0)
    // swap keeps LCS 9 of 10 -> 0.9, above threshold; found via shared shingles
    assert(pairs((1L, 3L)) === 0.9 && pairs((2L, 3L)) === 0.9)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // enforcement: lowest id survives each twin chain
    val kept = graft.dedup.Dedup
      .rougeLDedup(d, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 4L))
    // truncation: pair equal in the first 2 tokens, different after —
    // maxTokens=2 sees identical prefixes and scores 1.0
    val t2 = Seq((1L, "same same tail one two"), (2L, "same same other words here"))
      .toDF("doc_id", "text")
    val tr = graft.dedup.Dedup
      .rougeLNearDupPairs(t2, "doc_id", "text", threshold = 0.9,
        maxTokens = 2, shingleK = 1)
      .collect()
    assert(tr.length === 1 && tr.head.getAs[Double]("rouge_l") === 1.0)
  }

  test("prototypeScores: nearest-centroid assignment, smaller cell wins ties, zero-norm null") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),   // exactly centroid 0
      (2L, Seq(0.9f, 0.1f)),   // near centroid 0
      (3L, Seq(0.0f, 2.0f)),   // exactly centroid 1 direction
      (4L, Seq(1.0f, 1.0f)),   // equidistant -> tie -> cell 0
      (5L, Seq(0.0f, 0.0f))    // zero-norm -> unscorable
    ).toDF("id", "vec")
    val cents = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)))
      .toDF("cell", "centroid")
    val out = Similarity.prototypeScores(corpus, "id", "vec", cents)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(1L) === (Some(0), Some(1.0)))
    assert(out(3L) === (Some(1), Some(1.0)))
    assert(out(4L)._1 === Some(0)) // tie broken toward the smaller cell
    assert(out(5L) === (None, None))
    assert(out(2L)._1 === Some(0))
    assert(out(2L)._2.get.asInstanceOf[Double] > 0.9)
  }

  test("prototypePruneWithCentroids: the most prototypical quarter of each cell dies") {
    // cell 0: scores 1.0, ~0.995, ~0.97, ~0.89 -> prune the top ~0.89?
    // no: HIGH score = prototypical = pruned; cutoff = 75th pct
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),    // cos 1.0      -> above cutoff -> pruned
      (2L, Seq(0.99f, 0.1f)),   // cos ~0.995
      (3L, Seq(0.9f, 0.25f)),   // cos ~0.964
      (4L, Seq(0.8f, 0.4f)),    // cos ~0.894
      (5L, Seq(0.0f, 0.0f))     // unscorable -> always survives
    ).toDF("id", "vec")
    val cents = Seq((0, Seq(1.0f, 0.0f))).toDF("cell", "centroid")
    val kept = Similarity
      .prototypePruneWithCentroids(corpus, "id", "vec", cents,
        pruneFrac = 0.25, exact = true)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(2L, 3L, 4L, 5L))
    // pruneFrac 0 keeps everything (strictly-above rule)
    assert(Similarity.prototypePruneWithCentroids(corpus, "id", "vec",
      cents, pruneFrac = 0.0, exact = true).count() === 5L)
  }

  test("d4Select: semantic twin dies in stage 1, prototype core shrinks in stage 2") {
    // 30 docs in two tight clusters + one exact twin of doc 1
    // 3-degree angular spacing: every pairwise cosine <= cos(3°) ≈
    // 0.9986 < 0.999, so ONLY the planted exact twin crosses the dedup
    // threshold; the two arcs (0°–42°, 48°–90°) are the two clusters
    def unitAt(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val rows = (0 until 15).map(i => (i.toLong, unitAt(i * 3.0))) ++
      (15 until 30).map(i => (i.toLong, unitAt(90.0 - (i - 15) * 3.0)))
    val base = rows.toDF("id", "vec")
    val twin = base.filter($"id" === 1L)
      .select(($"id" + 1000).as("id"), $"vec")
    val corpus = base.unionByName(twin)
    val out = Similarity.d4Select(corpus, "id", "vec",
      nClusters = 2, dedupThreshold = 0.999, pruneFrac = 0.3, exact = true)
    val ids = out.select("id").as[Long].collect().toSet
    assert(!ids.contains(1001L), "the higher-id twin must die in semdedup")
    assert(ids.contains(1L))
    // prototype pruning removed ~30% of each cluster's survivors
    assert(ids.size < 30 && ids.size >= 18, s"got ${ids.size}")
    // survivors carry their diversification metadata
    assert(out.columns.contains("proto_cell") &&
      out.columns.contains("proto_score"))
  }
}
