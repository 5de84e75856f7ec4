package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-corpus curation (the RefinedWeb /
  * CCNet-style URL pipeline: the FIRST dedup axis a web corpus applies,
  * before any content hash — two fetches of one page should collapse on
  * the canonical URL, and per-site volume caps key on the registered
  * domain). Every rule is a closed-form column expression over
  * RE2-compatible regexes, so the DuckDB oracle reproduces the
  * canonical string byte-for-byte:
  *
  *  - scheme and host lowercase;
  *  - default ports stripped (http:80, https:443), others kept;
  *  - trailing slashes stripped from the path;
  *  - the fragment dropped;
  *  - tracking query parameters dropped (`utm_*` prefix plus the
  *    [[trackingParams]] list), survivors SORTED so parameter order
  *    never splits one logical URL into two.
  */
object Urls {

  /** Exact-name tracking parameters dropped beyond the utm_ prefix. */
  val trackingParams: Seq[String] = Seq("fbclid", "gclid")

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Lowercased scheme ('' when the value is not an absolute URL). */
  def scheme(url: Column): Column = lower(regexp_extract(url, schemeRe, 1))

  /** Lowercased host, port excluded. */
  def host(url: Column): Column =
    lower(regexp_extract(regexp_extract(url, hostPortRe, 1), "^([^:]*)", 1))

  /** Registered domain: the last two dot-labels of the host — the
    * per-site cap key (www./blog. variants fold together). A public-
    * suffix list would refine co.uk-style hosts; the two-label rule is
    * the stated contract here. */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** True when the raw URL carries a tracking parameter this module
    * would strip. */
  def hasTracking(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    exists(split(q, "&"), p => isTracking(p))
  }

  private def isTracking(p: Column): Column =
    trackingParams.map(t => p.startsWith(t + "="))
      .foldLeft(p.startsWith("utm_"))(_ || _)

  /** The canonical form (see object doc for the rules). Deterministic,
    * row-local, no UDF: regex extraction + a ≤|params|-element HOF
    * filter/sort — tiny arrays, so the CodegenFallback lambda is off
    * the hot path by construction. */
  def canonicalize(url: Column): Column = {
    val hostPort = regexp_extract(url, hostPortRe, 1)
    val sch = scheme(url)
    val h = host(url)
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val portPart = when(port === "" ||
        (sch === "https" && port === "443") ||
        (sch === "http" && port === "80"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(regexp_extract(url, pathRe, 1), "/+$", "")
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(
      filter(split(q, "&"), p => !isTracking(p) && p =!= "")), "&")
    val queryPart = when(kept === "", lit(""))
      .otherwise(concat(lit("?"), kept))
    concat(sch, lit("://"), h, portPart, path, queryPart)
  }
}
