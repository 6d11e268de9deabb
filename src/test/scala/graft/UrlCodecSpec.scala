package graft

import org.apache.spark.sql.functions._

import graft.codec.UrlCodec
import graft.plans.SketchFunctions

/**
 * X68 URL canonicalization: the rewrite set (scheme/host case, fragment,
 * default port, tracking params, path slash), totality on garbage,
 * idempotency, host extraction, and registered-domain suffix matching —
 * plus codegen agreement for the three expressions. The SQL oracles
 * (d_url_normalize / d_url_dedup / d_domain_filter) cover the planted
 * end-to-end paths; this spec owns the edge cases.
 */
class UrlCodecSpec extends SparkSpec {
  import spark.implicits._

  private val psl = Seq("com", "net", "org", "co.uk")

  test("normalize: case, default port, fragment, trailing slash") {
    assert(UrlCodec.normalize("HTTP://WWW.Example.COM:80/A/B/#x") ==
      "http://www.example.com/A/B")
    assert(UrlCodec.normalize("https://Host.Example.com:443") ==
      "https://host.example.com/")
    // non-default port survives; path case survives
    assert(UrlCodec.normalize("http://h.example.com:8080/Path/") ==
      "http://h.example.com:8080/Path")
    // root path: the lone slash is kept
    assert(UrlCodec.normalize("https://a.example.org/") == "https://a.example.org/")
  }

  test("normalize: tracking params stripped, order preserved, '?' dropped when emptied") {
    assert(UrlCodec.normalize("https://e.com/p?utm_source=x&id=7&UTM_Medium=y&ref=z") ==
      "https://e.com/p?id=7&ref=z")
    assert(UrlCodec.normalize("https://e.com/p?gclid=1&fbclid=2") == "https://e.com/p")
    // 'ref' is often SEMANTIC (GitHub ?ref=branch) — it must survive, only
    // the unambiguous click/campaign ids (ref_src included) are stripped
    assert(UrlCodec.normalize("https://e.com/tree?ref=main&ref_src=twsrc") ==
      "https://e.com/tree?ref=main")
    // non-tracking params keep their original order (no sort)
    assert(UrlCodec.normalize("https://e.com/p?b=2&a=1") == "https://e.com/p?b=2&a=1")
    // empty params dropped; a valueless non-tracking param survives
    assert(UrlCodec.normalize("https://e.com/p?&flag&utm_x=1") == "https://e.com/p?flag")
  }

  test("normalize is total on garbage and idempotent") {
    assert(UrlCodec.normalize("  not a url at all  ") == "not a url at all")
    assert(UrlCodec.normalize("see notes: //weird") == "see notes: //weird")
    // "://" mid-sentence is not a scheme
    assert(UrlCodec.normalize("a sentence with :// inside") == "a sentence with :// inside")
    assert(UrlCodec.normalize("") == "")
    val cases = Seq(
      "HTTP://A.B:80/c/?utm_a=1#f", "https://x@Host.COM:443/p?ref=r&q=1",
      "ftp://Files.Example.ORG:21/x/", "garbage # stuff", "https://e.com/p?b=2&a=1",
      "http://[::1]:8080/x", "https://e.com")
    cases.foreach { u =>
      val once = UrlCodec.normalize(u)
      assert(UrlCodec.normalize(once) == once, s"not idempotent on '$u'")
    }
  }

  test("host: userinfo and port stripped, IPv6 brackets survive") {
    assert(UrlCodec.host("https://user:pw@Host.Example.COM:8443/p") == "host.example.com")
    assert(UrlCodec.host("http://h.example.com/x") == "h.example.com")
    assert(UrlCodec.host("http://[::1]:8080/x") == "[::1]")
    assert(UrlCodec.host("http://[::1]/x") == "[::1]")
    assert(UrlCodec.host("not a url") == "")
  }

  test("registeredDomain: longest suffix wins at dot boundaries; PSL default fallback") {
    assert(UrlCodec.registeredDomain("deep.sub.example.com", psl) == "example.com")
    assert(UrlCodec.registeredDomain("docs.example.co.uk", psl) == "example.co.uk")
    // dot-boundary: "marco.uk" must not match suffix "co.uk"
    assert(UrlCodec.registeredDomain("marco.uk", psl) == "marco.uk")
    // unknown TLD: last label is the suffix (PSL '*' default)
    assert(UrlCodec.registeredDomain("files.weirdtld", psl) == "files.weirdtld")
    assert(UrlCodec.registeredDomain("a.b.files.weirdtld", psl) == "files.weirdtld")
    // host IS a suffix, single label, trailing dot, empty
    assert(UrlCodec.registeredDomain("co.uk", psl) == "co.uk")
    assert(UrlCodec.registeredDomain("localhost", psl) == "localhost")
    assert(UrlCodec.registeredDomain("Example.COM.", psl) == "example.com")
    assert(UrlCodec.registeredDomain("", psl) == "")
  }

  test("expression path (codegen) agrees with the kernel; null passes through") {
    SketchFunctions.register(spark)
    val rows = Seq("HTTP://WWW.Example.COM:80/a/?utm_source=x&id=1#f",
      "https://docs.Example.CO.UK:443/p/", "garbage", null)
    val got = rows.toDF("u")
      .select(SketchFunctions.url_normalize(col("u")).as("n"))
      .withColumn("h", SketchFunctions.url_host(col("n")))
      .withColumn("d", SketchFunctions.url_registered_domain(col("h"), psl))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), Option(r.getString(2))))
    val want = rows.map(Option(_).map(UrlCodec.normalize)).zip(
      rows.map(Option(_).map(UrlCodec.host))).map { case (n, h) =>
      (n, h, h.map(UrlCodec.registeredDomain(_, psl)))
    }
    assert(got.toSeq == want)
  }
}
