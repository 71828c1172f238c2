package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.CrawlOps

class CrawlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("robots parse: group attribution, star scoping, host scoping") {
    val robots = Seq(
      ("a.org",
        """# policy file
          |User-agent: googlebot
          |Disallow: /google-only/
          |
          |User-agent: *
          |Crawl-delay: 5
          |Disallow: /secret/
          |Disallow: /tmp/   # trailing comment
          |Disallow:
          |
          |User-agent: archiver
          |User-agent: mirror
          |Disallow: /all-of-it/""".stripMargin),
      ("b.org",
        """USER-AGENT: crawler
          |USER-AGENT: *
          |DISALLOW: /b-private/""".stripMargin))
      .toDF("host", "robots_txt")
    val rules = CrawlOps.robotsWildcardDisallows(robots)
      .orderBy("host", "prefix").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // a.org: only the * group's non-empty rules; googlebot and the
    // archiver/mirror group must not leak in; empty Disallow dropped.
    // b.org: consecutive UA lines share a group, so crawler+* binds *;
    // keys are case-insensitive.
    assert(rules == Seq(
      ("a.org", "/secret/"), ("a.org", "/tmp/"), ("b.org", "/b-private/")))
  }

  test("robots parse: no star group means no rules; rules before any UA dropped") {
    val robots = Seq(
      ("c.org", "User-agent: googlebot\nDisallow: /x/"),
      ("d.org", "Disallow: /orphan/\nUser-agent: *\nDisallow: /y/"))
      .toDF("host", "robots_txt")
    val rules = CrawlOps.robotsWildcardDisallows(robots)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(rules == Seq(("d.org", "/y/")))
  }

  test("robots gate: prefix match per host, clean pages allowed") {
    val rules = Seq(("a.org", "/secret/"), ("b.org", "/x/"))
      .toDF("host", "prefix")
    val pages = Seq(
      (1L, "a.org", "/secret/doc1"), // blocked
      (2L, "a.org", "/x/doc2"), // b.org's rule must not apply
      (3L, "b.org", "/x/doc3"), // blocked
      (4L, "c.org", "/secret/doc4"), // no rules for c.org at all
      (5L, "a.org", "/secretive"), // prefix is /secret/ — not a match
      (6L, "a.org", "/doc/6"))
      .toDF("doc_id", "host", "path")
    val out = CrawlOps.robotsGate(pages, rules)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("allowed"))).toSeq
    assert(out == Seq((1L, false), (2L, true), (3L, false), (4L, true),
      (5L, true), (6L, true)))
  }

  test("url canonicalization: corner cases") {
    import org.apache.spark.sql.functions.col
    val in = Seq(
      "HTTP://Host.ORG:80/A/B?utm_source=s&b=1&a=2#f",
      "https://host.org:443/",
      "https://host.org:8443/x",
      "http://host.org",
      "https://host.org/p?utm_a=1&utm_b=2&gclid=x&fbclid=y",
      "https://host.org/p?gclidx=keep", // prefix must not over-match
      "ftp://host.org/file", // non-http scheme -> NULL
      "mailto:x@host.org", // no authority -> NULL
      "not a url at all")
    val out = in.toDF("u")
      .select(graft.ops.CrawlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(
      Some("http://host.org/A/B?a=2&b=1"), // case+port+frag+track+sort
      Some("https://host.org/"),
      Some("https://host.org:8443/x"), // non-default port kept
      Some("http://host.org/"), // empty path -> /
      Some("https://host.org/p"), // all params tracking -> no ?
      Some("https://host.org/p?gclidx=keep"),
      None, None, None))
  }

  test("url canonicalization: idempotent on its own output") {
    import org.apache.spark.sql.functions.col
    val in = Seq(
      "HTTP://Host.ORG:80/A/B?utm_source=s&b=1&a=2#f",
      "https://host.org/p?z=1&y=2")
    val once = in.toDF("u")
      .select(graft.ops.CrawlOps.canonicalizeUrl(col("u")).as("c"))
    val twice = once
      .select(graft.ops.CrawlOps.canonicalizeUrl(col("c")).as("c2"),
        col("c"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}
