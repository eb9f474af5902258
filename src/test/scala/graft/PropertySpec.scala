package graft

import graft.dedup.Dedup
import graft.features.{OutlierTreatment, RuleImputer}
import graft.sampling.Sampling
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator invariants (SURVEY §5 layer 2), sampled with fixed
  * seeds and checked in a plain loop (the scalatest+scalacheck bridge isn't
  * in the offline dependency cache). Samples are few — each materializes
  * Spark jobs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: capping never leaves values outside bounds") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0)).suchThat(_.size >= 4)
    samples(gen, 5).foreach { xs =>
      val df = xs.toDF("x")
      val m = OutlierTreatment.fit(df, Seq("x"), exact = true)
      val b = m.bounds("x")
      val out = m.cap(df).agg(min("x"), max("x")).head()
      assert(out.getDouble(0) >= b.lower - 1e-9, s"input $xs")
      assert(out.getDouble(1) <= b.upper + 1e-9, s"input $xs")
    }
  }

  test("property: imputation leaves no nulls") {
    val gen = Gen.listOf(Gen.option(Gen.choose(-100.0, 100.0))).suchThat(_.exists(_.isDefined))
    samples(gen, 5).foreach { xs =>
      val df = xs.toDF("x")
      val m = RuleImputer.fit(df, Map("x" -> RuleImputer.Mean))
      assert(m.transform(df).filter(col("x").isNull || isnan(col("x"))).count() == 0, s"input $xs")
    }
  }

  test("property: train/test split partitions the frame") {
    val gen = for {
      n <- Gen.choose(50, 300)
      p <- Gen.choose(0.1, 0.5)
    } yield (n, p)
    samples(gen, 5).foreach { case (n, p) =>
      val df = (1 to n).map(i => (i, i % 3)).toDF("id", "y")
      val (tr, te) = Sampling.trainTestSplit(df, p, seed = 1)
      assert(tr.count() + te.count() == n)
      assert(tr.join(te, "id").count() == 0)
    }
  }

  test("property: hash split is a stable partition at ~the requested rate") {
    val df = (1 to 2000).map(i => (i.toLong, i % 2)).toDF("id", "y")
    val s1 = Sampling.stratifiedSplitHash(df, "y", 0.3, "id", "pX")
    // a partition: every row labeled, labels only train/test
    assert(s1.count() == 2000)
    assert(s1.select("split").distinct().collect().map(_.getString(0)).toSet == Set("train", "test"))
    // per-class test rate near 0.3 (binomial on 1000 draws: ±5σ ≈ ±0.073)
    s1.filter(col("split") === "test").groupBy("y").count().collect().foreach { r =>
      val rate = r.getLong(1) / 1000.0
      assert(math.abs(rate - 0.3) < 0.08, s"class ${r.get(0)} test rate $rate")
    }
    // pure function of (class, id, salt): adding rows NEVER reassigns
    // existing ones — the subset split equals the full split restricted
    val subset = Sampling.stratifiedSplitHash(df.filter(col("id") <= 500), "y", 0.3, "id", "pX")
    assert(subset.except(s1.filter(col("id") <= 500)).count() == 0)
    // a different salt draws a different split
    val s2 = Sampling.stratifiedSplitHash(df, "y", 0.3, "id", "pY")
    assert(s1.except(s2).count() > 0)
  }

  test("cluster-safe split never splits a near-dup cluster; singletons stay stable") {
    val df = (1 to 1000).map(i => (i.toLong, i % 2)).toDF("id", "y")
    // clusters: {1,2,3} and {10,11}; everything else singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster_id")
    val s = Sampling.clusterSafeSplit(df, "id", clusters, 0.3, "cx")
    assert(s.count() == 1000) // left join: no row lost or duplicated
    // all cluster members share their cluster's split
    val bySplit = s.filter(col("id").isin(1L, 2L, 3L))
      .select("split").distinct().count()
    val bySplit2 = s.filter(col("id").isin(10L, 11L))
      .select("split").distinct().count()
    assert(bySplit == 1 && bySplit2 == 1, "a near-dup cluster straddles the split")
    // cluster members draw as the cluster LABEL: member 3's split equals
    // what a singleton with id 1 would draw
    val label1 = Sampling.clusterSafeSplit(
      Seq((1L, 0)).toDF("id", "y"), "id", clusters.limit(0), 0.3, "cx")
      .head().getAs[String]("split")
    assert(s.filter(col("id") === 3L).head().getAs[String]("split") == label1)
    // singletons are unaffected by the cluster frame entirely
    val plain = Sampling.clusterSafeSplit(df, "id", clusters.limit(0), 0.3, "cx")
    assert(s.filter(!col("id").isin(1L, 2L, 3L, 10L, 11L))
      .except(plain.filter(!col("id").isin(1L, 2L, 3L, 10L, 11L))).count() == 0)
    // an id accidentally listed under two cluster labels must not
    // duplicate its rows — the canonical (min) label wins
    val dupLabels = clusters.union(Seq((2L, 999L)).toDF("id", "cluster_id"))
    val sDup = Sampling.clusterSafeSplit(df, "id", dupLabels, 0.3, "cx")
    assert(sDup.count() == 1000)
    assert(sDup.filter(col("id") === 2L).head().getAs[String]("split") ==
      s.filter(col("id") === 2L).head().getAs[String]("split"))
    // a new near-dup joining a cluster adopts the cluster's split rather
    // than reshuffling it: adding id 1001 to cluster 1 leaves 1-3 unchanged
    val grown = clusters.union(Seq((1001L, 1L)).toDF("id", "cluster_id"))
    val s2 = Sampling.clusterSafeSplit(
      df.union(Seq((1001L, 0)).toDF("id", "y")), "id", grown, 0.3, "cx")
    assert(s2.filter(col("id").isin(1L, 2L, 3L, 1001L))
      .select("split").distinct().count() == 1)
  }

  test("negative sampling covers the full id space; zero-evidence text gets null lang") {
    // the old linear-congruential draw never exceeded ~3.1M: on a large
    // id space every negative must still be able to land in the top half
    val ids = (0L until 200L).toDF("id")
    val negs = graft.sampling.Sampling.negativePairs(ids, "id", m = 5, idSpace = 1L << 40)
      .select("neg_id").as[Long].collect()
    assert(negs.forall(n => n >= 0 && n < (1L << 40)))
    assert(negs.exists(_ > (1L << 39)), "no negative ever reached the top half of the id space")
    // no-evidence text: null, not a confident 'de'
    val scored = graft.text.TextAnalysis.languageScores(
      Seq("hello world program", "der und die das ist").toDF("text"), "text")
    val out = scored.select("lang_detected").collect().map(r => Option(r.getString(0)))
    assert(out(0).isEmpty, s"zero-evidence text must get null lang, got ${out(0)}")
    assert(out(1).contains("de"))
  }

  test("property: span coverage is a fraction in [0,1], shrinking as minDf rises") {
    val gen = for {
      n <- Gen.choose(5, 30)
      vocab <- Gen.choose(3, 8)
    } yield (n, vocab)
    samples(gen, 3).foreach { case (n, vocab) =>
      // tiny vocabulary → dense cross-document gram collisions
      val docs = (1 to n).map { i =>
        val words = (0 until 12).map(j => s"w${(i * 7 + j * 3) % vocab}")
        (i.toLong, words.mkString(" "))
      }.toDF("id", "text")
      val at2 = graft.dedup.Dedup.dupSpanCoverage(docs, "id", "text", k = 3, minDf = 2)
      val at3 = graft.dedup.Dedup.dupSpanCoverage(docs, "id", "text", k = 3, minDf = 3)
      val f2 = at2.select("id", "dup_fraction").as[(Long, Double)].collect().toMap
      val f3 = at3.select("id", "dup_fraction").as[(Long, Double)].collect().toMap
      assert(f2.size == n && f3.size == n, "every doc must be reported")
      assert(f2.values.forall(f => f >= 0.0 && f <= 1.0), s"fraction out of range: $f2")
      // a stricter document-frequency bar can only shrink the duplicated set
      assert(f2.keys.forall(id => f3(id) <= f2(id) + 1e-9),
        s"coverage must be monotone non-increasing in minDf")
    }
  }

  test("property: exact dedup is idempotent and content-complete") {
    val gen = Gen.nonEmptyListOf(Gen.oneOf("aa bb", "cc dd", "ee ff", "gg hh"))
    samples(gen, 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = Dedup.exactDedup(df, "doc_id", "text")
      assert(Dedup.exactDedup(once, "doc_id", "text").count() == once.count())
      assert(once.count() == texts.distinct.size)
    }
  }

  test("property: chunking covers every token; zero-overlap chunks reassemble the text") {
    import graft.text.TextAnalysis
    val word = Gen.choose('a', 'z').flatMap(c => Gen.choose(1, 6).map(n => c.toString * n))
    val gen = for {
      nWords <- Gen.choose(1, 40)
      words <- Gen.listOfN(nWords, word)
      chunk <- Gen.choose(2, 8)
      overlap <- Gen.choose(0, 1)
    } yield (words, chunk, overlap)
    samples(gen, 5).foreach { case (words, chunk, overlap) =>
      val text = words.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = TextAnalysis.chunkDocuments(df, "doc_id", "text", chunk, overlap)
        .orderBy("chunk_id").select("chunk_text").as[String].collect().toSeq
      // token coverage: every chunk's tokens count against the original
      assert(chunks.map(_.split(" ").length).sum >= words.length,
        s"chunks must cover all tokens: $words chunk=$chunk overlap=$overlap")
      if (overlap == 0)
        assert(chunks.mkString(" ") == text,
          s"zero-overlap chunks must reassemble the text: $words chunk=$chunk")
    }
  }

  test("property: histogram preserves total count and orders edges") {
    import graft.profile.Profile
    val gen = for {
      n <- Gen.choose(5, 200)
      xs <- Gen.listOfN(n, Gen.choose(-500.0, 500.0))
      bins <- Gen.choose(1, 12)
    } yield (xs, bins)
    samples(gen, 5).foreach { case (xs, bins) =>
      val h = Profile.histogram(xs.toDF("x"), "x", bins).orderBy("bucket").collect()
      assert(h.map(_.getAs[Long]("n")).sum == xs.size, s"bins=$bins n=${xs.size}")
      h.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
    }
  }

  test("property: stratified sample keeps only listed strata at ~requested rates") {
    val df = (1 to 2000).map(i => (i, if (i % 2 == 0) "en" else "de")).toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "lang", Map("en" -> 0.5, "de" -> 0.1), seed = 7)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("en") - 500.0) < 150, s"en kept ${counts.get("en")}")
    assert(math.abs(counts.getOrElse("de", 0L) - 100.0) < 60, s"de kept ${counts.get("de")}")
    // determinism with a fixed seed
    val again = Sampling.stratifiedSample(df, "lang", Map("en" -> 0.5, "de" -> 0.1), seed = 7)
    assert(again.count() == out.count())
  }

  test("property: frequency encoding shares sum to 1 over seen categories") {
    import graft.features.Encoding
    val gen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
    samples(gen, 5).foreach { cats =>
      val m = Encoding.fitFrequencyEncoder(cats.toDF("c"), "c")
      val total = m.mapping.agg(sum(col("c_freq"))).head().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-9, s"input $cats")
    }
  }

  test("property: hashedShingles count equals string shingles count") {
    // the native kernel must walk the same windows as the interpreted
    // string construction — distinct-gram COUNTS are what Jaccard/overlap
    // consume, and hash collisions at these sizes are ~impossible.
    // Whitespace variety matters: Spark trim strips only ' ' and Spark
    // split keeps trailing empty tokens (Java defaults differ on both),
    // so texts with tabs/newlines/trailing whitespace are the regression
    // surface.
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val edge = Gen.oneOf("", " ", "\n", "\t ", "  ")
    val gen = for {
      words <- Gen.nonEmptyListOf(word).map(_.take(30))
      seps <- Gen.listOfN(words.size, sep)
      pre <- edge
      post <- edge
    } yield pre + words.zip(seps).map { case (w, s) => w + s }.mkString + post
    (2 to 4).foreach { k =>
      samples(gen, 5).foreach { text =>
        val row = Seq(text).toDF("t")
          .select(
            size(Dedup.shingles(col("t"), k)).as("s"),
            size(Dedup.hashedShingles(col("t"), k)).as("h"))
          .head()
        assert(row.getInt(0) == row.getInt(1), s"k=$k text=${text.map(_.toInt)}")
      }
    }
  }

  test("WordShingleHashes lowercases exactly like Spark lower(), even under tr locale") {
    // lower() on non-ASCII input falls back to String.toLowerCase() with
    // the JVM DEFAULT locale (UTF8String.toLowerCase); a kernel pinned to
    // Locale.ROOT silently breaks hashed-vs-string parity under tr/az
    // ('I' → 'ı'). Contract: kernel(text) == kernel(lower()-ed text),
    // whatever the default locale. Driver-side evals only — the tiny
    // locale window never touches executor threads.
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    def grams(text: String): Seq[Long] =
      graft.expressions.WordShingleHashes(Literal(UTF8String.fromString(text), StringType), 2)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    val text = "KIRMIZI İŞIK DUR" // ASCII 'I' + dotted 'İ' — tr special cases
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      val sparkLowered = UTF8String.fromString(text).toLowerCase.toString
      assert(grams(text) == grams(sparkLowered),
        "kernel lowering must match Spark's lower() under a tr default locale")
    } finally java.util.Locale.setDefault(saved)
  }

  test("property: SCD2 incremental fold equals rebuild; intervals tile per key") {
    val gen = for {
      nKeys <- Gen.choose(2, 6)
      n <- Gen.choose(5, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, nKeys.toLong)
        ts <- Gen.choose(0L, 20L)
        v <- Gen.oneOf("a", "b", "c")
      } yield (k, ts, v))
    } yield rows
    samples(gen, 4).foreach { rows =>
      val log = rows.toDF("k", "ts", "v")
      val all = graft.io.Tables.buildScd2(log, Seq("k"), "ts")
      // split strictly by time: late ts > 10 >= any affected open valid_from
      val early = log.filter($"ts" <= 10)
      val late = log.filter($"ts" > 10)
      if (early.count() > 0 && late.count() > 0) {
        val folded = graft.io.Tables.applyScd2(
          graft.io.Tables.buildScd2(early, Seq("k"), "ts"), late, Seq("k"), "ts")
        def canon(df: org.apache.spark.sql.DataFrame) =
          df.select("k", "v", "valid_from", "valid_to", "is_current")
            .orderBy("k", "valid_from").collect().map(_.toString).toSeq
        assert(canon(folded) === canon(all), s"fold != rebuild for $rows")
      }
      // interval invariants: per key exactly one open row; valid_to of each
      // closed row equals the next valid_from (gap-free tiling)
      val byKey = all.select("k", "valid_from", "valid_to")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getAs[java.lang.Long](2)).map(_.toLong))).groupBy(_._1)
      byKey.foreach { case (k, rs) =>
        assert(rs.count(_._3.isEmpty) === 1, s"key $k: open-row count != 1")
        val sorted = rs.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3.contains(b._2), s"key $k: interval gap")
          case _ =>
        }
      }
    }
  }

  test("property: CMS estimates never undercount; merge of any split equals recompute") {
    import graft.dp.IncrementalAgg._
    val gen = for {
      n <- Gen.choose(10, 80)
      items <- Gen.listOfN(n, Gen.choose(0, 15).map(i => s"it$i"))
    } yield items
    samples(gen, 4).foreach { items =>
      val df = items.toDF("x")
      val st = cmsState(df, "x", width = 16, depth = 3)
      val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val est = cmsEstimate(st, truth.keys.toSeq.toDF("x"), "x")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (k, n) => assert(est(k) >= n, s"$k: ${est(k)} < $n") }
      // arbitrary split point: merge == from-scratch counter for counter
      val cut = items.size / 3
      val merged = cmsMerge(
        cmsState(items.take(cut).toDF("x"), "x", width = 16, depth = 3),
        cmsState(items.drop(cut).toDF("x"), "x", width = 16, depth = 3))
      def counters(d: org.apache.spark.sql.DataFrame) =
        d.select("r", "slot", "cnt").collect()
          .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(counters(merged) === counters(st))
    }
  }

  test("property: zorderKey matches the reference interleave and is per-dimension monotone") {
    import graft.io.Layout
    def ref(xs: Seq[Long], bits: Int): Long =
      (for { i <- 0 until bits; (x, j) <- xs.zipWithIndex }
        yield ((x >> i) & 1L) << (i * xs.size + j)).sum
    val gen = for {
      n <- Gen.choose(2, 4)
      bits <- Gen.choose(4, 12)
      xs <- Gen.listOfN(n, Gen.choose(0L, (1L << bits) - 1))
    } yield (xs, bits)
    val cases = samples(gen, 6)
    val got = cases.map { case (xs, bits) =>
      spark.range(1).select(Layout.zorderKey(xs.map(lit(_)), bits)).head.getLong(0)
    }
    cases.zip(got).foreach { case ((xs, bits), z) =>
      assert(z === ref(xs, bits), s"interleave mismatch for $xs@$bits")
      // holding other dims fixed, bumping one dim never decreases the key
      // (each dimension's bits sit at fixed positions)
      xs.indices.foreach { j =>
        if (xs(j) + 1 < (1L << bits)) {
          val bumped = xs.updated(j, xs(j) + 1)
          assert(ref(bumped, bits) > z, s"monotonicity broke bumping dim $j of $xs")
        }
      }
    }
  }

  test("property: unigram encode is an exact cover for arbitrary word corpora") {
    import graft.text.Unigram
    val word = for {
      len <- Gen.choose(1, 10)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd', 'z'))
    } yield cs.mkString
    val gen = for {
      n <- Gen.choose(3, 25)
      ws <- Gen.listOfN(n, word)
    } yield ws
    samples(gen, 3).foreach { ws =>
      val docs = ws.grouped(5).map(_.mkString(" ")).toSeq.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pieces = Unigram.train(docs, "text", vocabSize = 16)
      val audit = Unigram.encodeAudit(
        Unigram.encode(docs, "text", pieces), "doc_id", "text")
      assert(audit.filter(!$"roundtrip_ok" || !$"count_sane").count() === 0L,
        s"invariants broke on $ws")
      // piece ids are dense 0..n with unk at 0
      val ids = pieces.select("piece_id").collect().map(_.getInt(0)).sorted
      assert(ids.toSeq === (0 until ids.length))
    }
  }
}
