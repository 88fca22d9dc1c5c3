package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL/domain-level dedup rollups — the
  * crawl-curation stage that collapses re-crawls and tracking-URL
  * variants of the same page before content dedup runs (first-class
  * pipeline surface; not in the reference).
  *
  * Canonicalization is a pure regex projection (both-dialect-safe,
  * like [[Scrub]]): strip fragment, strip query string, lowercase
  * scheme and host, drop a leading `www.`, strip one trailing slash
  * from the path. Registered-domain (eTLD+1) folding needs the public
  * suffix list — out of scope; `domain` here is the canonical host.
  *
  * Scale shape of [[urlDedupRollup]]: one keyed aggregate on the
  * canonical URL (the big shuffle — hash-partitioned, no skew beyond
  * genuinely hot URLs, which per-URL duplicate caps bound upstream if
  * needed), then a domain-keyed re-aggregate whose input is one row
  * per distinct URL — already ~dedup-rate smaller.
  */
object UrlOps {

  private def stripFragment(u: Column): Column = regexp_replace(u, "#.*$", "")
  private def stripQuery(u: Column): Column = regexp_replace(u, "\\?.*$", "")

  private val schemeHostPath = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/]*)(/.*)?$"

  /** Canonical host of a URL: lowercased, leading `www.` dropped.
    * Non-URL strings yield the empty string. */
  def domainOf(u: Column): Column =
    regexp_replace(
      lower(regexp_extract(stripQuery(stripFragment(u)), schemeHostPath, 2)),
      "^www\\.", "")

  /** Canonical form: `lower(scheme)://domain(path with one trailing
    * slash stripped)`. Query string and fragment are tracking noise
    * for dedup purposes — dropped wholesale (the aggressive-but-
    * standard crawl-dedup default; keep a raw column upstream if the
    * query is load-bearing for your corpus). */
  def canonicalizeUrl(u: Column): Column = {
    val bare = stripQuery(stripFragment(u))
    val scheme = lower(regexp_extract(bare, schemeHostPath, 1))
    val path = regexp_replace(regexp_extract(bare, schemeHostPath, 3), "/$", "")
    concat(scheme, lit("://"), domainOf(u), path)
  }

  /** Two-label public suffixes (vendored slice of publicsuffix.org —
    * see `resources/graft/public_suffix_slice.txt`; a deployment
    * ships the full PSL through the same one-suffix-per-line seam).
    * Public: the q90 oracle inlines this exact set. */
  val publicSuffixes: Set[String] = {
    val stream = getClass.getResourceAsStream("/graft/public_suffix_slice.txt")
    require(stream != null, "missing resource graft/public_suffix_slice.txt")
    try scala.io.Source.fromInputStream(stream, "UTF-8").getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .toSet
    finally stream.close()
  }

  /** Registrable domain (eTLD+1) of a URL: the [[domainOf]] host
    * folded to `label.suffix` — where the suffix is two labels when
    * the host's last two labels are a known public suffix (bbc.co.uk
    * stays bbc.co.uk; news.bbc.co.uk folds to bbc.co.uk), else one
    * label (a.b.example.com → example.com). The crawl-curation
    * grouping key for per-site caps and domain-level dedup: plain
    * host grouping over-splits sites that shard across subdomains.
    * Wildcard/exception PSL rules are out of this slice's scope.
    * Hosts with a single label (or empty) pass through unchanged. */
  def registrableDomain(u: Column): Column = {
    val host = domainOf(u)
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), last2)
    val suffixes = publicSuffixes.toSeq.sorted
    when(n <= 2, host)
      .when(last2.isin(suffixes: _*), last3)
      .otherwise(last2)
  }

  /** Per-domain dedup rollup: collapse rows by canonical URL
    * (first-wins keeper = min id), then per domain report distinct
    * URLs, total crawled docs, and how many rows URL-dedup removed. */
  def urlDedupRollup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df
      .withColumn("__curl", canonicalizeUrl(col(urlCol)))
      .withColumn("__dom", domainOf(col(urlCol)))
      .groupBy(col("__dom"), col("__curl"))
      .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__keeper"))
      .groupBy(col("__dom").as("domain"))
      .agg(
        count(lit(1)).as("n_urls"),
        sum(col("__n")).as("n_docs"),
        sum(col("__n") - 1).as("n_removed"))
}
