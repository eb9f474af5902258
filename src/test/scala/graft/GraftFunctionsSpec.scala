package graft

import graft.functions.{GraftExtensions, GraftFunctions}
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("graft_dot matches the Column API kernel") {
    val d = spark.sql("SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .as[Double].head()
    assert(d == 32.0)
    // same kernel as Similarity.dot over a real frame
    val df = Seq((1L, Array(0.5f, 0.5f))).toDF("id", "v")
    df.createOrReplaceTempView("gf_v")
    val sql = spark.sql("SELECT graft_dot(v, v) AS d FROM gf_v").as[Double].head()
    val api = df.select(graft.similarity.Similarity.dot(col("v"), col("v"))).as[Double].head()
    assert(sql == api)
  }

  test("graft_simhash64 and graft_shingle_hashes agree with the expression API") {
    Seq((1L, "the quick brown fox jumps")).toDF("id", "text").createOrReplaceTempView("gf_t")
    val sqlSim = spark.sql("SELECT graft_simhash64(text) AS h FROM gf_t").as[Long].head()
    val apiSim = spark.table("gf_t")
      .select(graft.dedup.Dedup.simhash64(col("text")).as("h"))
      .as[Long].head()
    assert(sqlSim == apiSim)
    val n = spark.sql("SELECT size(graft_shingle_hashes(text, 3)) AS n FROM gf_t").as[Int].head()
    assert(n == 3) // 5 tokens -> 3 distinct trigrams
  }

  test("graft_minhash takes a token/shingle array, returns numHashes values") {
    Seq((1L, "a b c d e f")).toDF("id", "text").createOrReplaceTempView("gf_m")
    val n = spark.sql(
      "SELECT size(graft_minhash(split(lower(text), ' '), 16)) AS n FROM gf_m")
      .as[Int].head()
    assert(n == 16)
  }

  test("graft_morton matches Tables.mortonCode") {
    val z = spark.sql("SELECT graft_morton(3, 5) AS z").as[Long].head()
    assert(z == 39L)
  }

  test("graft_normalize: composition, compatibility folding, control strip, form guard") {
    import org.apache.spark.sql.functions._
    val decomposed = "cafe\u0301"      // e + combining acute U+0301
    val fullwidth = "\uFF21\uFF22"    // fullwidth A B
    val ligature = "\uFB01le"          // fi-ligature + le
    val withCtl = "a\u0007b c\td\u0000\ne" // BEL + NUL stripped, tab/newline kept
    Seq((1L, decomposed), (2L, fullwidth), (3L, ligature), (4L, withCtl))
      .toDF("id", "s").createOrReplaceTempView("gf_n")
    // NFC composes but keeps compatibility characters
    val nfc = spark.sql("SELECT id, graft_normalize(s, 'NFC') AS n FROM gf_n ORDER BY id")
      .as[(Long, String)].collect().toMap
    assert(nfc(1L) == "caf\u00e9")
    assert(nfc(2L) == fullwidth)
    // NFKC (the default) also folds fullwidth/ligature variants
    val nfkc = spark.sql("SELECT id, graft_normalize(s) AS n FROM gf_n ORDER BY id")
      .as[(Long, String)].collect().toMap
    assert(nfkc(1L) == "caf\u00e9")
    assert(nfkc(2L) == "AB")
    assert(nfkc(3L) == "file")
    assert(nfkc(4L) == "ab c\td\ne")
    // Column API parity + null passthrough
    val viaApi = Seq(Some(decomposed), None).toDF("s")
      .select(graft.text.TextAnalysis.normalizeText(col("s"), "NFC").as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(viaApi.toSeq == Seq("caf\u00e9", null))
    // invalid form fails analysis loudly
    val err = intercept[Exception] {
      spark.sql("SELECT graft_normalize('x', 'NFX') FROM gf_n").collect()
    }
    assert(err.getMessage.contains("NFC"), s"unexpected error: ${err.getMessage}")
  }

  test("graft_md5_bits52 equals the conv(substring(md5)) idiom bit for bit") {
    // every portable draw/slot in the library depends on this equality —
    // an off-by-one in the nibble packing would silently change every
    // sample, split, and CMS slot vs the DuckDB oracles
    val rows = spark.range(2000)
      .selectExpr(
        "graft_md5_bits52(concat('probe:', id)) AS fast",
        "CAST(conv(substring(md5(concat('probe:', id)), 1, 13), 16, 10) AS BIGINT) AS ref",
        "graft_md5_bits52('') AS empty_fast",
        "CAST(conv(substring(md5(''), 1, 13), 16, 10) AS BIGINT) AS empty_ref")
    assert(rows.filter("fast != ref OR empty_fast != empty_ref").count() === 0)
    assert(rows.filter("fast < 0 OR fast >= pow(2, 52)").count() === 0)
  }

  test("graft_ngram_slots equals the transform+concat md5-slot route (as multisets)") {
    // the kernel interleaves unigram/bigram slots per position while the
    // string route lists unigrams then bigrams — same multiset, which is
    // all the downstream groupBy counts (and the DSIR oracles) depend on
    val ok = spark.sql(
      """SELECT array_sort(graft_ngram_slots(tk, 64)) =
        |  array_sort(transform(
        |    concat(tk, transform(sequence(0, size(tk) - 2),
        |      j -> concat(tk[j], ' ', tk[j + 1]))),
        |    g -> pmod(CAST(conv(substring(md5(g), 1, 13), 16, 10) AS BIGINT), 64)))
        |  AS same
        |FROM (SELECT split('one two three four two one', ' ') AS tk)""".stripMargin)
      .head().getBoolean(0)
    assert(ok)
  }

  test("graft_deflate_ratio: repetitive < prose, empty is null, SQL/API parity") {
    import spark.implicits._
    val df = Seq(
      ("rep", ("spam " * 60).trim),
      ("prose", "the quick brown fox jumps over the lazy dog and then wanders home through quiet autumn streets"),
      ("empty", "")).toDF("k", "s")
    df.createOrReplaceTempView("gf_dr")
    val m = spark.sql("SELECT k, graft_deflate_ratio(s) AS r FROM gf_dr")
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(m("empty") == null)
    val rep = m("rep").asInstanceOf[Double]
    val prose = m("prose").asInstanceOf[Double]
    assert(rep > 0 && rep < prose && prose < 1.5)
    val viaApi = df.select(col("k"),
      graft.text.TextAnalysis.deflateRatio(col("s")).as("r"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(viaApi == m)
  }

  test("graft_html_text: script/style/comment removal, block newlines, entities, whitespace") {
    import spark.implicits._
    val cases = Seq(
      // block structure survives as newlines; inline tags vanish silently
      ("<h1>Title</h1><p>one <b>two</b></p><p>three</p>", "Title\none two\nthree"),
      // script/style dropped WHOLE (content too), comments dropped
      ("<p>keep</p><script>drop < this</script><style>p{}</style><!-- no -->", "keep"),
      // entities: named, double-escaped stays literal, numeric dec + hex
      ("a &amp; b &amp;lt; c &#65;&#x42;", "a & b &lt; c AB"),
      // escaped NUMERIC references also stay literal after one decode
      // level (numeric pass runs before the &amp; rewrite)
      ("&amp;#65; vs &#65;", "&#65; vs A"),
      // nbsp becomes a space and collapses; blank lines drop
      ("<div>x&nbsp;&nbsp;y</div><div>  </div><div>z</div>", "x y\nz"),
      // malformed numeric reference left as-is; unclosed tag stripped
      ("<p>&#xZZ; tail", "&#xZZ; tail"),
      // self-closing and attribute-laden block tags still break lines
      ("""one<br/>two<div class="a">three</div>""", "one\ntwo\nthree"))
    val got = cases.map(_._1).toDF("h")
      .selectExpr("graft_html_text(h) AS t").as[String].collect().toSeq
    cases.zip(got).foreach { case ((in, want), t) =>
      assert(t == want, s"for [$in]: got [$t], want [$want]")
    }
  }

  test("the extensions class injects the same registrations") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; wiring is shared with register()
  }
  test("htmlTitle / htmlDeclaredLang: hand cases") {
    import graft.text.TextAnalysis
    def meta(h: String): (String, String) =
      Seq(h).toDF("h")
        .select(TextAnalysis.htmlTitle(col("h")), TextAnalysis.htmlDeclaredLang(col("h")))
        .as[(String, String)].head()
    // entity decode + whitespace collapse in the title; lang lowercased
    assert(meta("""<html lang="en-US"><head><title> A &amp;  B </title></head></html>""")
      === (("A & B", "en-us")))
    // single quotes; attribute order and other attributes around lang
    assert(meta("""<html dir="ltr" lang='pt-BR' class="x"><title>t</title></html>""")
      === (("t", "pt-br")))
    // missing title and lang -> empty strings, not nulls/crashes
    assert(meta("<html><body>x</body></html>") === (("", "")))
    // first title wins; case-insensitive tags; multiline title
    assert(meta("<HTML><TITLE>one\ntwo</TITLE><title>late</title></HTML>")
      === (("one two", "")))
    // a lang-like attribute on another tag must not match
    assert(meta("""<html><span lang="fr">x</span></html>""") === (("", "")))
  }
}

