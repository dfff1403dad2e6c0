package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def parsed(urls: (Long, String)*) =
    UrlOps.parse(urls.toDF("doc_id", "url"), "url")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getInt(3), r.getInt(4))).toMap

  test("host strips scheme, userinfo, and port; case-normalized") {
    val got = parsed(
      1L -> "https://User:pw@WWW.Example.COM:8443/a/b?x=1",
      2L -> "http://plain.org/",
      3L -> "https://no-port.net")
    assert(got(1L)._1 == "www.example.com")
    assert(got(2L)._1 == "plain.org")
    assert(got(3L)._1 == "no-port.net")
  }

  test("registrable domain: two labels default, three on public second levels") {
    val got = parsed(
      1L -> "https://news.bbc.co.uk/x",
      2L -> "https://a.b.example.com/",
      3L -> "https://localhost/",
      4L -> "https://web.ac.jp/")
    assert(got(1L)._2 == "bbc.co.uk")
    assert(got(2L)._2 == "example.com")
    assert(got(3L)._2 == "", "single-label host has no registrable domain")
    assert(got(4L)._2 == "web.ac.jp")
  }

  test("path depth and query parameter counts") {
    val got = parsed(
      1L -> "https://h.com/a/b/c?x=1&y=2&z=3",
      2L -> "https://h.com/",
      3L -> "https://h.com/a//b?#frag",
      4L -> "https://h.com?only=param")
    assert(got(1L)._3 == 3 && got(1L)._4 == 3)
    assert(got(2L)._3 == 0 && got(2L)._4 == 0)
    assert(got(3L)._3 == 2, "empty segments don't count")
    assert(got(3L)._4 == 0, "empty query before fragment")
    assert(got(4L)._3 == 0 && got(4L)._4 == 1)
  }

  test("garbage is total: empty host and zero counts, no exceptions") {
    val got = parsed(1L -> "not a url at all", 2L -> "ftp//broken")
    assert(got(1L) == (("", "", 0, 0)))
    assert(got(2L) == (("", "", 0, 0)))
  }

  test("registrableDomainsPsl: wildcard, exception, longest-match, default") {
    import spark.implicits._
    val urls = Seq(
      1L -> "https://www.ck/x",               // exception rule !www.ck
      2L -> "https://bar.foo.ck/",            // wildcard *.ck → foo.ck is PS
      3L -> "https://foo.ck",                 // host IS a public suffix
      4L -> "https://a.b.github.io",          // multi-label exact github.io
      5L -> "https://x.bbc.co.uk/p?q=1",      // co.uk beats uk
      6L -> "https://deep.a.b.c.com",         // plain com
      7L -> "https://site.zz",                // unlisted TLD → default *
      8L -> "https://sub.city.kawasaki.jp",   // exception beats wildcard
      9L -> "https://zz"                      // bare TLD → ""
    ).toDF("doc_id", "url")
    val got = UrlOps.registrableDomainsPsl(urls, "url")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got(1L) == (("www.ck", 1L)))
    assert(got(2L) == (("bar.foo.ck", 2L)))
    assert(got(3L) == (("", 2L)))
    assert(got(4L) == (("b.github.io", 2L)))
    assert(got(5L) == (("bbc.co.uk", 2L)))
    assert(got(6L) == (("c.com", 1L)))
    assert(got(7L) == (("site.zz", 1L)))
    assert(got(8L) == (("city.kawasaki.jp", 2L)))
    assert(got(9L) == (("", 1L)))
  }
}
