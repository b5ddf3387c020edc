package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCanonicalSpec extends SparkSpec {
  import UrlCanonical.canonicalize

  test("canonicalize collapses the crawl-duplicate families") {
    // case + default port + fragment + dot-segments
    assert(canonicalize("HTTP://Example.COM:80/a/./x/../b#frag")
      == "http://example.com/a/b")
    assert(canonicalize("https://Example.com:443/") == "https://example.com/")
    // tracking params dropped; survivors sorted; empty query dropped
    assert(canonicalize("http://e.com/p?utm_source=tw&b=2&a=1&fbclid=XYZ")
      == "http://e.com/p?a=1&b=2")
    assert(canonicalize("http://e.com/p?gclid=1&UTM_campaign=x")
      == "http://e.com/p")
    // empty path normalizes to /; directory slash is identity-bearing and kept
    assert(canonicalize("http://e.com") == "http://e.com/")
    assert(canonicalize("http://e.com/dir/") == "http://e.com/dir/")
    // .. never climbs above root; // carries no identity
    assert(canonicalize("http://e.com/../../x//y") == "http://e.com/x/y")
    // non-default port, userinfo, ipv6 bracket host survive
    assert(canonicalize("http://u:p@E.com:8080/q") == "http://u:p@e.com:8080/q")
    assert(canonicalize("http://[::1]:80/x") == "http://[::1]/x")
    // percent-encoding untouched (documented non-goal)
    assert(canonicalize("http://e.com/a%2Fb") == "http://e.com/a%2Fb")
    // NOT a scheme://host URL → unchanged, byte for byte
    assert(canonicalize("not a url < at all") == "not a url < at all")
    assert(canonicalize("mailto:x@y.z") == "mailto:x@y.z")
    assert(canonicalize("") == "")
  }

  test("canonicalize is idempotent on every family above") {
    val cases = Seq(
      "HTTP://Example.COM:80/a/./x/../b#frag",
      "http://e.com/p?utm_source=tw&b=2&a=1&fbclid=XYZ",
      "http://e.com", "http://e.com/dir/", "http://e.com/../../x//y",
      "http://u:p@E.com:8080/q", "http://[::1]:80/x", "not a url",
      "https://a.b/c?z=1&y=2&x=3#f")
    cases.foreach { u =>
      val once = canonicalize(u)
      assert(canonicalize(once) == once, s"not idempotent on $u → $once")
    }
  }

  test("graft_strip_html cleans an already-landed raw-HTML text column inside the plan") {
    import spark.implicits._
    val docs = Seq(
      "<html><body><h1>T</h1><p>a &amp; b</p><script>x()</script></body></html>",
      "no markup at all",
      "a < b stays math").toDF("text")
    val got = docs.selectExpr("graft_strip_html(text) AS t").collect().map(_.getString(0))
    assert(got.toSeq == Seq("T a & b", "no markup at all", "a < b stays math"))
    assert(Seq[Option[String]](None).toDF("text")
      .selectExpr("graft_strip_html(text)").head().isNullAt(0))
  }

  test("graft_canonical_url runs as a native expression inside the plan and groups URL dups") {
    import spark.implicits._
    val urls = Seq(
      "http://Example.com:80/a/../b?utm_source=x",
      "http://example.com/b",
      "http://example.com/b#section-2",
      "http://other.example/b").toDF("url")
    val grouped = urls
      .groupBy(expr("graft_canonical_url(url)").as("canon"))
      .count().orderBy("canon").collect()
    assert(grouped.map(r => r.getString(0) -> r.getLong(1)).toSeq == Seq(
      "http://example.com/b" -> 3L,
      "http://other.example/b" -> 1L))
    // null flows through as null, not a throw
    assert(Seq[Option[String]](None).toDF("url")
      .selectExpr("graft_canonical_url(url)").head().isNullAt(0))
  }
}
