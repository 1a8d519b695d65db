package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkTestBase {

  test("extractUrls: multiple mentions in order, trailing punctuation stripped, none for plain text") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "see https://a.example.com/p/1, then http://b.net/x?q=2. done"),
      (2L, "no links here"),
      (3L, "bare https://c.org end")).toDF("doc_id", "text")
    val m = UrlOps.urlMentions(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(m == Map(
      (1L, 0) -> "https://a.example.com/p/1",
      (1L, 1) -> "http://b.net/x?q=2",
      (3L, 0) -> "https://c.org"), s"got $m")
  }

  test("hostOf + registrableDomain: subdomains collapse to last two labels; ports and paths excluded") {
    val session = spark
    import session.implicits._
    val urls = Seq(
      "https://x.y.news.example.com/a/1",
      "http://example.com/b",
      "http://single/x",
      "http://a.com:8080/p").toDF("url")
    val got = urls.select(
        UrlOps.hostOf(col("url")).as("h"),
        UrlOps.registrableDomain(UrlOps.hostOf(col("url"))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("x.y.news.example.com", "example.com"),
      ("example.com", "example.com"),
      ("single", "single"),
      ("a.com", "a.com")), s"got $got")
  }

  test("domainProfile: exact mention and distinct-doc counts per domain") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "https://a.x.com/1 https://b.x.com/2"),
      (2L, "https://c.x.com/3 and http://y.org/z")).toDF("doc_id", "text")
    val p = UrlOps.domainProfile(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(p == Map("x.com" -> (3L, 2L), "y.org" -> (1L, 1L)), s"got $p")
  }

  test("canonicalizeUrl: case, fragments, default ports, bare root; non-defaults preserved") {
    val session = spark
    import session.implicits._
    val cases = Seq(
      ("HTTP://WWW.Example.COM:80/Path/1?q=A#frag", "http://www.example.com/Path/1?q=A"),
      ("https://Sub.Site.org:8443/", "https://sub.site.org:8443"),
      ("HTTPS://Host.NET:443/x/Y#z", "https://host.net/x/Y"),
      ("http://plain.io", "http://plain.io"),
      ("http://a.com/", "http://a.com"),
      ("http://a.com:8080/p/Q?x=1&y=2", "http://a.com:8080/p/Q?x=1&y=2"),
      ("https://b.io:80/k", "https://b.io:80/k"), // 80 is NOT https default
      // trailing-dot FQDN ≡ bare host (matches hostOf, so blocklist and
      // frontier keys agree), with and without a port
      ("https://Example.COM./p", "https://example.com/p"),
      ("http://h.io.:8080/x", "http://h.io:8080/x"))
    val got = cases.map(_._1).toDF("u")
      .select(col("u"), UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, exp) => assert(got(in) == exp, s"$in -> ${got(in)}") }
  }

  test("canonicalizeUrl is idempotent (stable frontier keys) and total on degenerate inputs") {
    val session = spark
    import session.implicits._
    val urls = Seq(
      "HTTP://WWW.Example.COM:80/Path/1?q=A#frag",
      "https://Sub.Site.org:8443/",
      "http://a.com/",
      "http://h",                    // host only
      "https://h:443",               // default port, no path
      "http://h:0/x",                // weird port preserved
      "not a url at all",            // no scheme → degenerate, must not throw
      "")
    val once = urls.toDF("u")
      .select(col("u"), UrlOps.canonicalizeUrl(col("u")).as("c1"))
    val twice = once.select(col("u"), col("c1"),
        UrlOps.canonicalizeUrl(col("c1")).as("c2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    twice.filter(t => t._1.toLowerCase.startsWith("http")).foreach { case (u, c1, c2) =>
      assert(c1 == c2, s"not idempotent for [$u]: [$c1] -> [$c2]")
    }
    // non-URLs degrade to the empty-ish "://" skeleton, never an error
    val nonUrl = twice.find(_._1 == "not a url at all").get
    assert(nonUrl._2 == "://", s"degenerate: ${nonUrl._2}")
  }

  test("capPerDomain: keeps k lowest ids per first-mention domain; no-URL docs always pass") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (5L, "https://a.x.com/1"),
      (3L, "https://b.x.com/2"),
      (9L, "https://c.x.com/3"),
      (2L, "https://d.y.org/4"),
      (7L, "no urls in this one"),
      // second mention is x.com but the FIRST (y.org) decides the domain
      (8L, "http://y.org/5 then https://e.x.com/6")).toDF("doc_id", "text")
    val kept = UrlOps.capPerDomain(docs, k = 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // x.com keeps {3,5} (drops 9); y.org keeps {2,8}; 7 has no URL
    assert(kept == Seq(2L, 3L, 5L, 7L, 8L), s"got $kept")
  }

  test("filterBlockedDomains: drops docs with ANY blocked mention, keeps the rest; blocklist side broadcast") {
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "fine https://good.example.com/1"),
      (2L, "mixed https://good.example.com/2 and http://ads.bad.net/x"),
      (3L, "no urls at all"),
      (4L, "http://bad.net/direct"),
      (5L, "case dodge http://Spam.BAD.net/y"),     // DNS is case-insensitive
      (6L, "dot dodge http://x.bad.net./z")).toDF("doc_id", "text") // trailing-dot FQDN
    val block = Seq("bad.net", "never-seen.io").toDF("domain")
    val kept = UrlOps.filterBlockedDomains(docs, block)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    val plan = kept.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"blocklist join not broadcast:\n$plan")
  }
}
