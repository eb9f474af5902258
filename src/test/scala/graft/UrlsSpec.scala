package graft

import graft.text.Urls
import org.apache.spark.sql.functions._

/** URL canonicalization / registered-domain / URL-level dedup: hand
  * cases for every policy rule, then the pipeline pieces. */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Urls.normalizeUrl($"u")).as[String].head

  private def dom(u: String): String =
    Seq(u).toDF("u").select(Urls.registeredDomain($"u")).as[String].head

  test("normalizeUrl: each policy rule, hand-computed") {
    // already canonical: unchanged
    assert(norm("http://ex.com/p?q=1") === "http://ex.com/p?q=1")
    // scheme+host lowercase; PATH case preserved
    assert(norm("HTTP://EX.COM/Path/File") === "http://ex.com/Path/File")
    // www + default port
    assert(norm("http://www.Ex.com:80/a") === "http://ex.com/a")
    assert(norm("https://WWW.ex.COM:443/a") === "https://ex.com/a")
    // NON-default port survives
    assert(norm("http://ex.com:8080/a") === "http://ex.com:8080/a")
    // fragment
    assert(norm("http://ex.com/a#frag") === "http://ex.com/a")
    // tracking params: middle, trailing, only, consecutive
    assert(norm("http://ex.com/a?utm_source=x&q=1") === "http://ex.com/a?q=1")
    assert(norm("http://ex.com/a?q=1&utm_campaign=y") === "http://ex.com/a?q=1")
    assert(norm("http://ex.com/a?fbclid=z") === "http://ex.com/a")
    assert(norm("http://ex.com/a?gclid=1&msclkid=2&b=3") === "http://ex.com/a?b=3")
    assert(norm("http://ex.com/a?utm_a=1&utm_b=2&q=1") === "http://ex.com/a?q=1")
    // a DIFFERENT param whose name merely ends in a tracking name, and a
    // tracking-looking path segment, must both survive untouched
    assert(norm("http://ex.com/a?xgclid=5&q=1") === "http://ex.com/a?xgclid=5&q=1")
    assert(norm("http://ex.com/gclid=5/page") === "http://ex.com/gclid=5/page")
    // trailing slash runs
    assert(norm("http://ex.com/a///") === "http://ex.com/a")
    assert(norm("http://ex.com/") === "http://ex.com")
    // whitespace trim
    assert(norm("  http://ex.com/a ") === "http://ex.com/a")
    // scheme-less input passes through the string rules only
    assert(norm("ex.com/a/") === "ex.com/a")
  }

  test("registeredDomain: eTLD+1 with multi-label suffixes") {
    assert(dom("http://a.b.example.com/x") === "example.com")
    assert(dom("http://www.example.co.uk/x") === "example.co.uk")
    assert(dom("https://deep.sub.site.com.au/x") === "site.com.au")
    assert(dom("http://example.org/x") === "example.org")
    assert(dom("http://localhost/x") === "localhost")
    assert(dom("http://EX.com:8080/x") === "ex.com")
    // literal IPs have no registrable suffix: the whole host IS the
    // grouping key (truncating 192.168.0.1 to '0.1' would misgroup every
    // IP-hosted crawl page)
    assert(dom("http://192.168.0.1/x") === "192.168.0.1")
    assert(dom("http://10.0.0.7:8080/x") === "10.0.0.7")
    // bracketed IPv6: the whole literal (port stripped) is the key —
    // hostOf must not stop at the first ':' inside the address
    assert(dom("http://[2001:db8::1]/x") === "[2001:db8::1]")
    assert(dom("https://[2001:DB8::1]:8443/x") === "[2001:db8::1]")
  }

  test("dedupByUrl keeps the latest fetch per canonical url") {
    val fetches = Seq(
      ("http://ex.com/p", 100L, "old"),
      ("HTTP://WWW.EX.COM:80/p", 300L, "latest"),
      ("http://ex.com/p?utm_source=x", 200L, "mid"),
      ("http://other.com/q", 50L, "only")).toDF("url", "ts", "tag")
    val out = Urls.dedupByUrl(fetches, "url", "ts")
      .select($"url_normalized", $"tag").as[(String, String)].collect().toSet
    assert(out === Set(("http://ex.com/p", "latest"), ("http://other.com/q", "only")))
  }

  test("dedupByUrl plan: bounded-heap partial aggregation, no window") {
    val fetches = (1 to 100).map(i => (s"http://e$i.com/", i.toLong)).toDF("url", "ts")
    val plan = Urls.dedupByUrl(fetches, "url", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_top_k") && !plan.contains("Window"),
      s"fetch history must reduce map-side:\n$plan")
  }

  test("domainMix shares sum to 1; deny filter drops the domain") {
    val urls = (Seq.fill(6)("http://a.com/x") ++ Seq.fill(3)("http://www.b.co.uk/y") ++
      Seq.fill(1)("http://c.org/z")).toDF("url")
    val mix = Urls.domainMix(urls, "url")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(mix.map(t => (t._1, t._2)).toSeq ===
      Seq(("a.com", 6L), ("b.co.uk", 3L), ("c.org", 1L)))
    assert(math.abs(mix.map(_._3).sum - 1.0) < 1e-6)
    val kept = Urls.filterDeniedDomains(urls, "url", Seq("a.com", "c.org"))
      .count()
    assert(kept === 3)
  }
}
