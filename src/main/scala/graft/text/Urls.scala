package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level crawl curation — the stage between WARC ingestion and
  * content dedup in a Common-Crawl-shaped pipeline (CCNet/RefinedWeb
  * both dedupe and filter by URL before touching document text, because
  * a fetch of the same canonical URL is a duplicate no content hash
  * needs to prove).
  *
  * Everything here is a pure Column composition (codegen'd regex/string
  * ops — no UDF, no shuffle until the caller aggregates), and every
  * transform is deterministic, so the registered queries carry FULL
  * DuckDB oracles against planted URL zoos.
  *
  * Normalization policy (the standard canonicalizer, documented rather
  * than configurable):
  *   1. trim; strip the `#fragment`;
  *   2. lowercase the `scheme://host[:port]` part (path/query case is
  *      significant and kept);
  *   3. drop a leading `www.` host label and the scheme-default port
  *      (`:80` http, `:443` https);
  *   4. drop tracking query parameters (`utm_*`, `fbclid`, `gclid`,
  *      `msclkid`), then clean the dangling `?`/`&` they leave;
  *   5. drop trailing `/` runs (directory-form and file-form of the
  *      same resource fold together).
  */
object Urls {

  /** `scheme://host[:port]` prefix of a URL ("" when scheme-less). */
  private val SchemeHostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  /** The canonical form of a URL column per the policy above. */
  def normalizeUrl(url: Column): Column = {
    val t = regexp_replace(trim(url), "#.*$", "")
    val head = regexp_extract(t, SchemeHostRe, 0)
    // lowercase ONLY the scheme://host part, keep the rest verbatim
    val rest = expr_substr(t, length(head) + 1)
    val loweredHead = lower(head)
    val noWww = regexp_replace(loweredHead, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/:?#]+):80$", "$1"),
      "^(https://[^/:?#]+):443$", "$1")
    val rejoined = concat(noPort, rest)
    // tracking params: kill `name=value` only when the name STARTS a
    // query parameter — the lookbehind anchors to ?/& without consuming
    // it, so 'xgclid=5' (a different param) and '/gclid=5/' (a path
    // segment) survive, and consecutive tracking params all match in one
    // pass (the separator each match needs is never eaten by the
    // previous one). Spark-side Java regex only — the oracles state
    // canonical strings outright and never replay this pattern.
    val noTrack = regexp_replace(rejoined,
      "(?<=[?&])(?:utm_[a-zA-Z0-9]+|fbclid|gclid|msclkid)=[^&#]*&?", "")
    val noDangle = regexp_replace(regexp_replace(noTrack, "[?&]+$", ""), "\\?&", "?")
    regexp_replace(noDangle, "/+$", "")
  }

  /** substring(col, pos, rest-of-string) — Spark's `substring` needs a
    * length, `substr(Column, Column)` takes pos only. */
  private def expr_substr(c: Column, pos: Column): Column =
    c.substr(pos, length(c) - pos + 1)

  /** Host of a URL (lowercased, port stripped); "" when not parseable.
    * Bracketed IPv6 hosts (`[2001:db8::1]`, possibly followed by a port)
    * are matched whole — the generic `[^/:?#]+` arm would stop at the
    * first ':' inside the address. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(
      trim(url), "^[a-zA-Z][a-zA-Z0-9+.-]*://(\\[[^\\]]*\\]|[^/:?#]+)", 1))

  /** Multi-label public suffixes the naive last-two-labels rule would
    * split wrongly — the high-traffic subset (an offline stand-in for
    * the full Mozilla Public Suffix List; extend as needed). */
  val MultiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za", "com.sg", "com.tw")

  /** Registered domain (eTLD+1) of a URL: last two host labels, or last
    * THREE when the last two form a known multi-label public suffix
    * ("a.b.co.uk" → "b.co.uk", "a.b.com" → "b.com"). Hosts with < 2
    * labels (localhost) and literal IP addresses (dotted-IPv4,
    * `[bracketed-IPv6]`) pass through unchanged — an IP has no
    * registrable suffix, and truncating 192.168.0.1 to "0.1" would
    * misgroup every IP-hosted crawl page. */
  def registeredDomain(url: Column): Column = {
    val host = hostOf(url)
    val isIp = host.rlike("^\\d+(\\.\\d+){3}$") || host.rlike("^\\[.*\\]$")
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    when(isIp || n <= 2, host)
      .when(array_contains(
        lit(MultiLabelSuffixes.toArray), lastTwo) && n >= 3, lastThree)
      .otherwise(lastTwo)
  }

  /** URL-level dedup: one row per canonical URL, keeping the LATEST
    * fetch (`tsCol` DESC, ties by the remaining columns — deterministic).
    * Rides the bounded-heap top-k aggregate, so each map partition ships
    * one candidate row per URL, never the fetch history. Output: the
    * original columns plus `url_normalized`. */
  def dedupByUrl(df: DataFrame, urlCol: String, tsCol: String): DataFrame = {
    val withNorm = df.withColumn("url_normalized", normalizeUrl(col(urlCol)))
    graft.dp.TopK
      .topKPerKey(withNorm, Seq("url_normalized"), Seq(tsCol), k = 1)
      .drop("rank")
  }

  /** Per-registered-domain corpus mix: page count and share — the
    * domain-balance report a crawl curation pass starts from (and the
    * input to domain allow/deny decisions). One groupBy; the share
    * denominator is a broadcast 1-row aggregate, not a collect. */
  def domainMix(df: DataFrame, urlCol: String): DataFrame = {
    val perDomain = df
      .select(registeredDomain(col(urlCol)).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_pages"))
    val total = perDomain.agg(sum(col("n_pages")).as("__total"))
    perDomain
      .crossJoin(broadcast(total))
      .select(col("domain"), col("n_pages"),
        round(col("n_pages") / col("__total"), 6).as("share"))
  }

  /** Domain deny-list filter: drop rows whose registered domain is in
    * `denied` (broadcast — deny lists are list-sized, not corpus-sized). */
  def filterDeniedDomains(df: DataFrame, urlCol: String, denied: Seq[String]): DataFrame =
    df.filter(!registeredDomain(col(urlCol)).isin(denied: _*))
}
