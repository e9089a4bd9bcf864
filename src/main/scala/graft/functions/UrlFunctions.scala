package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registered-domain extraction for web-corpus
  * curation (URL-level dedup, domain mixing quotas, blocklist filters —
  * the CCNet/C4-style front half of a crawl pipeline; reference analog:
  * the scan-config path normalization in scan_sources.py, which does the
  * same normalize-then-group for filesystem paths).
  *
  * Everything is pure `Column` expression composition — regexp splits,
  * array HOFs (`filter`/`array_sort`/`array_join`) — so it stays inside
  * whole-stage codegen, is map-side only (no shuffle), and replays
  * exactly in the DuckDB oracle. At 100 TB URL canonicalization runs
  * once per crawl record; a UDF here would dominate scan CPU.
  *
  * Canonical form:
  *   - scheme + host lowercased; leading `www.` stripped
  *   - default ports (`:80` http, `:443` https) stripped
  *   - fragment dropped
  *   - tracking params dropped (`utm_*`, `fbclid`, `gclid`, `ref`)
  *   - surviving query params sorted (byte order) so param order never
  *     splits a URL into two identities
  *   - trailing `/` on a non-root path stripped
  */
object UrlFunctions {

  private val trackingRe = "^(utm_[a-z]+|fbclid|gclid|ref)="

  /** Lowercased host (no port, no www.) of a URL column. */
  def host(url: Column): Column = {
    val h = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    val noPort = regexp_replace(h, ":[0-9]+$", "")
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Canonicalized URL (see object doc). Null-safe: non-URL input → NULL
    * via the scheme/host extract returning the empty string. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val h = host(url)
    val rawPath = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    // '/' must canonicalize like the empty path: 'http://x.com' and
    // 'http://x.com/' are the same resource, and stripping the lone '/'
    // in the otherwise-branch would give them DIFFERENT identities
    // (empty→'/', '/'→''), defeating URL-level dedup.
    val path = when(rawPath === "" || rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    // Query: split on '&', drop empties + tracking params, sort, rejoin.
    val rawQ = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(rawQ, "&"),
      p => length(p) > lit(0) && not(p.rlike(trackingRe)))
    val q = array_join(array_sort(params), "&")
    when(scheme === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), h, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Registered domain of a host: last two labels, or last three when the
    * TLD is a 2-letter ccTLD and the second-level label is a generic
    * grouper (the `example.co.uk` family). A full public-suffix list is a
    * data file, not logic — this is the standard heuristic core; swap in
    * the PSL as a broadcast lookup when exactness matters. */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val second = when(n >= 2, element_at(labels, -2)).otherwise(lit(""))
    val generic2ld = second.isin("co", "com", "ac", "gov", "org", "net", "edu")
    val take3 = length(tld) === 2 && generic2ld && n >= 3
    when(hostCol.isNull || n < 2, hostCol)
      .otherwise(when(take3,
          concat_ws(".", element_at(labels, -3), second, tld))
        .otherwise(concat_ws(".", second, tld)))
  }
}
