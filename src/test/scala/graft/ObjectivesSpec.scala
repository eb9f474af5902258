package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Objectives

/** Training-objective transforms (text/Objectives.scala): FIM, span
  * corruption, prefix-LM split, UL2 mixture. The strongest invariant in
  * every case is LOSSLESSNESS — reassembling the transform's output
  * must reproduce the original document exactly. */
class ObjectivesSpec extends SparkSpec {
  import spark.implicits._

  private def md5bits(s: String): Long =
    graft.expressions.Md5Bits52.bits52(UTF8String.fromString(s))

  private val docs = Seq(
    (1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
    (2L, ""),
    (3L, "solo"),
    (4L, (0 until 45).map(i => s"t$i").mkString(" ")),
    (5L, "snow☃man café mixed 😀 emoji text here ok")
  ).toDF("doc_id", "text")

  // ------------------------------------------------------------- FIM

  test("fimTransform: applied rows reassemble to the original text in both modes") {
    val out = Objectives
      .fimTransform(docs, "doc_id", "text", rate = 1.0, spmRate = 0.5, seed = 1L)
      .select("doc_id", "text", "fim_mode", "cut_lo", "cut_hi", "fim_text")
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      val text = r.getAs[String]("text")
      val fim = r.getAs[String]("fim_text")
      val lo = r.getAs[Long]("cut_lo").toInt
      val hi = r.getAs[Long]("cut_hi").toInt
      val cps = text.codePoints().toArray
      def cut(a: Int, b: Int) = new String(cps, a, b - a)
      val (prefix, middle, suffix) = (cut(0, lo), cut(lo, hi), cut(hi, cps.length))
      r.getAs[String]("fim_mode") match {
        case "psm" => assert(fim ===
          s"<|fim_prefix|>$prefix<|fim_suffix|>$suffix<|fim_middle|>$middle")
        case "spm" => assert(fim ===
          s"<|fim_prefix|><|fim_suffix|>$suffix<|fim_middle|>$prefix$middle")
        case m => fail(s"unexpected mode $m at rate=1.0")
      }
      assert(prefix + middle + suffix === text)
      assert(0 <= lo && lo <= hi && hi <= cps.length)
    }
  }

  test("fimTransform: rate 0 passes everything through; draws replay the md5 idiom") {
    val none = Objectives
      .fimTransform(docs, "doc_id", "text", rate = 0.0, seed = 1L)
      .select("fim_applied", "fim_mode", "cut_lo", "fim_text", "text")
      .collect()
    none.foreach { r =>
      assert(!r.getAs[Boolean]("fim_applied"))
      assert(r.getAs[String]("fim_mode") === "none")
      assert(r.isNullAt(r.fieldIndex("cut_lo")))
      assert(r.getAs[String]("fim_text") === r.getAs[String]("text"))
    }
    // the cut points are exactly the library's portable draws
    val r4 = Objectives
      .fimTransform(docs, "doc_id", "text", rate = 1.0, seed = 9L)
      .filter($"doc_id" === 4L)
      .select("cut_lo", "cut_hi").head()
    val len = (0 until 45).map(i => s"t$i").mkString(" ").length.toLong
    val a = md5bits(s"fim:9:4:cut1") % (len + 1)
    val b = md5bits(s"fim:9:4:cut2") % (len + 1)
    assert(r4.getAs[Long]("cut_lo") === math.min(a, b))
    assert(r4.getAs[Long]("cut_hi") === math.max(a, b))
  }

  test("fimTransform: deterministic per seed, different across seeds") {
    val x = Objectives.fimTransform(docs, "doc_id", "text", seed = 5L)
      .select("doc_id", "fim_text").collect().toSeq
    val y = Objectives.fimTransform(docs, "doc_id", "text", seed = 5L)
      .select("doc_id", "fim_text").collect().toSeq
    val z = Objectives.fimTransform(docs, "doc_id", "text", seed = 6L)
      .select("doc_id", "fim_text").collect().toSeq
    assert(x === y)
    assert(x !== z)
  }

  // -------------------------------------------------- span corruption

  /** Parse "<extra_id_k> tok tok <extra_id_k+1> …" back into spans. */
  private def parseTarget(target: String): Map[Int, Seq[String]] = {
    val parts = target.split("<extra_id_").filter(_.nonEmpty)
    parts.map { p =>
      val k = p.takeWhile(_ != '>').toInt
      val toks = p.dropWhile(_ != '>').drop(1).trim
      k -> (if (toks.isEmpty) Seq.empty[String] else toks.split(" ").toSeq)
    }.toMap
  }

  test("spanCorrupt: interleaving target spans into the input reconstructs the document") {
    val out = Objectives
      .spanCorrupt(docs, "doc_id", "text", meanSpan = 3, noiseDensity = 0.15)
      .select("doc_id", "text", "n_spans", "n_masked_tokens",
        "span_input", "span_target")
      .collect()
    out.foreach { r =>
      val toks = r.getAs[String]("text").split("\\s+").filter(_.nonEmpty).toSeq
      val nSpans = r.getAs[Long]("n_spans")
      assert(nSpans === toks.length / 20,
        s"doc ${r.getAs[Long]("doc_id")}: one span per full 20-token block")
      val spans = parseTarget(r.getAs[String]("span_target"))
      // final sentinel closes the target (T5 wire format)
      assert(spans.contains(nSpans.toInt) && spans(nSpans.toInt).isEmpty)
      val rebuilt = r.getAs[String]("span_input")
        .split(" ").filter(_.nonEmpty)
        .flatMap { t =>
          if (t.startsWith("<extra_id_"))
            spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
          else Seq(t)
        }.toSeq
      assert(rebuilt === toks, s"doc ${r.getAs[Long]("doc_id")} roundtrip")
      assert(r.getAs[Long]("n_masked_tokens") ===
        (0 until nSpans.toInt).map(k => spans(k).length).sum.toLong)
    }
  }

  test("spanCorrupt: block draws match the md5 arithmetic by hand (doc 4, 45 tokens)") {
    // 45 tokens, B=20 -> 2 full blocks + clean 5-token tail
    val r = Objectives
      .spanCorrupt(docs.filter($"doc_id" === 4L), "doc_id", "text")
      .select("n_spans", "span_input", "span_target").head()
    assert(r.getAs[Long]("n_spans") === 2L)
    val lens = (0 until 2).map(b => 1 + (md5bits(s"sc:0:4:$b:len") % 5).toInt)
    val offs = (0 until 2).map(b =>
      (md5bits(s"sc:0:4:$b:off") % (20 - lens(b) + 1)).toInt)
    val toks = (0 until 45).map(i => s"t$i")
    val expectedInput = (0 until 45).flatMap { i =>
      val b = i / 20
      if (b < 2 && i % 20 == offs(b)) Some(s"<extra_id_$b>")
      else if (b < 2 && i % 20 > offs(b) && i % 20 < offs(b) + lens(b)) None
      else Some(toks(i))
    }.mkString(" ")
    val expectedTarget = (0 until 2).map { b =>
      s"<extra_id_$b> " +
        (0 until lens(b)).map(j => toks(b * 20 + offs(b) + j)).mkString(" ")
    }.mkString(" ") + " <extra_id_2>"
    assert(r.getAs[String]("span_input") === expectedInput)
    assert(r.getAs[String]("span_target") === expectedTarget)
  }

  test("spanCorrupt: empty and short docs stay clean with the bare closing sentinel") {
    val out = Objectives.spanCorrupt(docs, "doc_id", "text")
      .select("doc_id", "n_spans", "span_input", "span_target")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(2L).getAs[Long]("n_spans") === 0L)
    assert(out(2L).getAs[String]("span_input") === "")
    assert(out(2L).getAs[String]("span_target") === "<extra_id_0>")
    assert(out(3L).getAs[String]("span_input") === "solo")
    assert(out(1L).getAs[String]("span_input") ===
      "alpha bravo charlie delta echo foxtrot golf hotel")
  }

  test("spanCorrupt: rejects densities whose max span cannot fit the block") {
    intercept[IllegalArgumentException] {
      Objectives.spanCorrupt(docs, "doc_id", "text",
        meanSpan = 10, noiseDensity = 0.9)
    }
  }

  // --------------------------------------------------- prefix-LM / UL2

  test("prefixLmSplit: input ++ target is the document, cut is the replayed draw") {
    val out = Objectives.prefixLmSplit(docs, "doc_id", "text", seed = 2L)
      .select("doc_id", "text", "cut", "prefix_input", "prefix_target")
      .collect()
    out.foreach { r =>
      val text = r.getAs[String]("text")
      assert(r.getAs[String]("prefix_input") + r.getAs[String]("prefix_target")
        === text)
      val n = text.codePointCount(0, text.length)
      val expected = md5bits(s"plm:2:${r.getAs[Long]("doc_id")}:cut") % (n + 1)
      assert(r.getAs[Long]("cut") === expected)
    }
  }

  test("ul2Mix: partition of the corpus; R-slice equals spanCorrupt called alone") {
    val out = Objectives.ul2Mix(docs, "doc_id", "text", seed = 4L)
      .select("doc_id", "denoiser", "input", "target").collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    out.foreach { r =>
      val d = r.getAs[String]("denoiser")
      val u = (md5bits(s"ul2:4:${r.getAs[Long]("doc_id")}:task") + 0.5) /
        4503599627370496.0
      val expected = if (u < 0.5) "R" else if (u < 0.75) "S" else "X"
      assert(d === expected)
      assert(r.getAs[String]("input").startsWith(s"[$d] "))
    }
    val rDocs = out.filter(_.getAs[String]("denoiser") == "R")
      .map(_.getAs[Long]("doc_id")).toSet
    if (rDocs.nonEmpty) {
      val alone = Objectives
        .spanCorrupt(docs.filter($"doc_id".isin(rDocs.toSeq: _*)),
          "doc_id", "text", meanSpan = 3, noiseDensity = 0.15, seed = 4L)
        .select("doc_id", "span_input", "span_target").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("span_input"), r.getAs[String]("span_target"))).toMap
      out.filter(_.getAs[String]("denoiser") == "R").foreach { r =>
        val (in, tgt) = alone(r.getAs[Long]("doc_id"))
        assert(r.getAs[String]("input") === s"[R] $in")
        assert(r.getAs[String]("target") === tgt)
      }
    }
  }
}
