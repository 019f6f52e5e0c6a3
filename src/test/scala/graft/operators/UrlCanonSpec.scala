package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization string-level contract: every rule exercised on its
  * own, plus the cases the rules must NOT touch.
  */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[Option[String]] =
    urls.toSeq.toDF("url")
      .select(TextOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("case, default port, www, trailing slash, fragments, tracking params all normalize") {
    assert(canon(
      "HTTP://Example.COM/Path",            // scheme+host lowercased, path case KEPT
      "http://example.com:80/a",            // http default port dropped
      "https://example.com:443/a",          // https default port dropped
      "http://example.com:8080/a",          // non-default port is routing — kept
      "http://www.example.com/a",           // leading www dropped
      "http://example.com/a/",              // trailing slash dropped
      "http://example.com/a///",            // all trailing slashes
      "http://example.com/a#frag",          // fragment dropped (never parsed in)
      "http://example.com/a?utm_source=x&b=2&utm_medium=y&a=1&fbclid=z",
      "http://example.com/a?b=2&a=1"        // params sorted
    ) == Seq(
      Some("http://example.com/Path"),
      Some("http://example.com/a"),
      Some("https://example.com/a"),
      Some("http://example.com:8080/a"),
      Some("http://example.com/a"),
      Some("http://example.com/a"),
      Some("http://example.com/a"),
      Some("http://example.com/a"),
      Some("http://example.com/a?a=1&b=2"),
      Some("http://example.com/a?a=1&b=2")))
  }

  test("distinct resources stay distinct; malformed URLs canonicalize to NULL") {
    val out = canon(
      "http://example.com/a?a=1",
      "https://example.com/a?a=1",   // scheme is part of identity
      "http://other.com/a?a=1",      // host too
      "http://example.com/a?a=2",    // and non-tracking params
      "not a url at all")
    assert(out.take(4).flatten.distinct.size == 4, s"collisions in $out")
    assert(out.last.isEmpty, "malformed input must be NULL, not a crash")
  }

  test("urlDedup groups by canonical form with keeper/count semantics") {
    val df = Seq(
      (1L, "http://example.com/x"),
      (2L, "HTTP://WWW.EXAMPLE.COM:80/x/"),
      (3L, "http://example.com/y")).toDF("id", "url")
    val out = TextOps.urlDedup(df, "url", "id").orderBy("id")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, "http://example.com/x", 1L, 2L, false),
      (2L, "http://example.com/x", 1L, 2L, true),
      (3L, "http://example.com/y", 3L, 1L, false)))
  }

  test("urlDedup: distinct malformed URLs are NOT duplicates of each other") {
    // NULL canonical forms must each be their own singleton group — a
    // window partitioned on the raw NULL would lump every unparseable URL
    // (common in crawl data) into one group and silently drop all but one
    val df = Seq(
      (1L, "complete garbage"),
      (2L, "also not a url"),
      (3L, "http://example.com/ok")).toDF("id", "url")
    val out = TextOps.urlDedup(df, "url", "id").orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1))
    assert(out.forall(r => !r.getBoolean(4)), "no row may be marked dup")
    assert(out.forall(r => r.getLong(3) == 1L), "all singleton groups")
  }
}
