package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Urls

/** URL canonicalization rules (text/Urls, gate t22), each pinned on a
  * hand-built case so a regex regression fails here before the oracle.
  */
class UrlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalize(col("url"))).collect()
      .map(_.getString(0)).toSeq

  test("case folding, default ports, trailing slash, fragment") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/A/Path/#frag",
      "http://example.com:80/x",
      "http://example.com:8080/x/",
      "https://example.com:80/x") == Seq(
      // path case is preserved; scheme/host folded; :443 default on
      // https; trailing slash and fragment dropped
      "https://www.example.com/A/Path",
      "http://example.com/x",
      "http://example.com:8080/x",
      // :80 is NOT the https default — kept
      "https://example.com:80/x"))
  }

  test("tracking params dropped, survivors sorted, ? dropped when " +
      "none survive; empty path collapses to bare authority") {
    assert(canon(
      "http://a.example.com/p?utm_source=x&b=2&a=1&fbclid=zz",
      "http://a.example.com/p?utm_campaign=only&gclid=g",
      "http://a.example.com?x=1",
      "http://a.example.com/") == Seq(
      "http://a.example.com/p?a=1&b=2",
      "http://a.example.com/p",
      "http://a.example.com?x=1",
      "http://a.example.com"))
  }

  test("two query-param orders of one logical URL collapse") {
    val c = canon("http://a.example.com/p?ref=home&utm_campaign=x",
      "http://a.example.com/p?utm_source=feed&ref=home")
    assert(c.distinct.size == 1 && c.head == "http://a.example.com/p?ref=home")
  }

  test("registeredDomain folds subdomains; hasTracking spots utm_ " +
      "prefix and exact ids anywhere in the query") {
    val df = Seq(
      ("http://blog.news.example.org/x?utm_x=1", true),
      ("https://www.example.com/y?a=1&gclid=q", true),
      ("http://example.com/z?gclidx=1", false), // not gclid=
      ("http://example.com/z", false)).toDF("url", "want")
    val got = df.select(Urls.registeredDomain(col("url")),
      Urls.hasTracking(col("url")), col("want")).collect()
    assert(got.map(_.getString(0)).toSeq ==
      Seq("example.org", "example.com", "example.com", "example.com"))
    for (r <- got) assert(r.getBoolean(1) == r.getBoolean(2), r.toString)
  }

  test("t22's per-domain report: dedup and cap arithmetic on a tiny " +
      "planted corpus") {
    // one domain, 4 docs over 2 canonical urls; cap applies at k=25 so
    // kept = both survivors (min doc_id each)
    val u = Seq(
      (1L, "http://a.example.com/p1"), (2L, "http://a.example.com/p1/"),
      (3L, "http://a.example.com/p2?utm_x=1"),
      (4L, "HTTP://A.EXAMPLE.com/p2"))
      .toDF("doc_id", "url")
      .select(col("doc_id"),
        Urls.canonicalize(col("url")).as("canon"),
        Urls.registeredDomain(col("url")).as("domain"),
        Urls.hasTracking(col("url")).cast("long").as("trk"))
    val per = u.groupBy("domain", "canon")
      .agg(count(lit(1)).as("n"), min("doc_id").as("keep"),
        sum("trk").as("trk"))
      .orderBy("canon").collect()
    assert(per.map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq == Seq(("http://a.example.com/p1", 2L, 1L),
        ("http://a.example.com/p2", 2L, 3L)))
    // registeredDomain folds the a. subdomain to the registrable suffix
    assert(per.forall(_.getString(0) == "example.com"))
  }
}
