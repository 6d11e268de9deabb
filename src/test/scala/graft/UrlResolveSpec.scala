package graft

import org.apache.spark.sql.functions._

import graft.codec.UrlCodec
import graft.plans.SketchFunctions

/**
 * X85 RFC 3986 §5.2 relative resolution: the full §5.4 reference example
 * suite (normal + abnormal), the stated fragment-dropping deviation,
 * totality on garbage bases, and codegen agreement. The d_link_resolve /
 * d_warc_link_graph oracles cover the planted end-to-end paths.
 */
class UrlResolveSpec extends SparkSpec {
  import spark.implicits._

  private val base = "http://a/b/c/d;p?q"
  private def r(ref: String): String = UrlCodec.resolve(base, ref)

  test("RFC 3986 §5.4.1 normal examples (fragments dropped by design)") {
    assert(r("g:h") == "g:h")
    assert(r("g") == "http://a/b/c/g")
    assert(r("./g") == "http://a/b/c/g")
    assert(r("g/") == "http://a/b/c/g/")
    assert(r("/g") == "http://a/g")
    assert(r("//g") == "http://g")
    assert(r("?y") == "http://a/b/c/d;p?y")
    assert(r("g?y") == "http://a/b/c/g?y")
    // RFC keeps fragments; this codec drops them everywhere (stated), so
    // "#s" and "g#s" resolve to the fragment-less targets
    assert(r("#s") == "http://a/b/c/d;p?q")
    assert(r("g#s") == "http://a/b/c/g")
    assert(r("g?y#s") == "http://a/b/c/g?y")
    assert(r(";x") == "http://a/b/c/;x")
    assert(r("g;x") == "http://a/b/c/g;x")
    assert(r("g;x?y#s") == "http://a/b/c/g;x?y")
    assert(r("") == "http://a/b/c/d;p?q")
    assert(r(".") == "http://a/b/c/")
    assert(r("./") == "http://a/b/c/")
    assert(r("..") == "http://a/b/")
    assert(r("../") == "http://a/b/")
    assert(r("../g") == "http://a/b/g")
    assert(r("../..") == "http://a/")
    assert(r("../../") == "http://a/")
    assert(r("../../g") == "http://a/g")
  }

  test("RFC 3986 §5.4.2 abnormal examples") {
    // more '..' than segments: extras are dropped, never go above root
    assert(r("../../../g") == "http://a/g")
    assert(r("../../../../g") == "http://a/g")
    assert(r("/./g") == "http://a/g")
    assert(r("/../g") == "http://a/g")
    // dots that are PART of a segment name are not special
    assert(r("g.") == "http://a/b/c/g.")
    assert(r(".g") == "http://a/b/c/.g")
    assert(r("g..") == "http://a/b/c/g..")
    assert(r("..g") == "http://a/b/c/..g")
    // nonsensical dot forms
    assert(r("./../g") == "http://a/b/g")
    assert(r("./g/.") == "http://a/b/c/g/")
    assert(r("g/./h") == "http://a/b/c/g/h")
    assert(r("g/../h") == "http://a/b/c/h")
    assert(r("g;x=1/./y") == "http://a/b/c/g;x=1/y")
    assert(r("g;x=1/../y") == "http://a/b/c/y")
    // queries are opaque — dot segments inside them stay
    assert(r("g?y/./x") == "http://a/b/c/g?y/./x")
    assert(r("g?y/../x") == "http://a/b/c/g?y/../x")
  }

  test("totality: garbage base, bare-host base, scheme-bearing refs with dots") {
    // base without "://" can't anchor — ref passes through
    assert(UrlCodec.resolve("not a url", "/x") == "/x")
    assert(UrlCodec.resolve("", "g") == "g")
    // base with no path: directory is "/"
    assert(UrlCodec.resolve("http://h.org", "g") == "http://h.org/g")
    assert(UrlCodec.resolve("http://h.org?q=1", "g") == "http://h.org/g")
    // absolute ref normalizes its own dot segments; query preserved
    assert(UrlCodec.resolve(base, "https://x.org/a/../b?k=v") ==
      "https://x.org/b?k=v")
    // non-hierarchical absolute refs pass through whole
    assert(UrlCodec.resolve(base, "mailto:admin@site.org") ==
      "mailto:admin@site.org")
  }

  test("url_resolve expression (codegen) agrees with the codec; null passes through") {
    val refs = Seq("g", "../g", "/g", "//g", "?y", "", "#s", "g:h", null)
    val got = refs.toDF("r")
      .select(SketchFunctions.url_resolve(lit(base), col("r")).as("u"))
      .collect().map(row => Option(row.getString(0)))
    val want = refs.map(Option(_).map(UrlCodec.resolve(base, _)))
    assert(got.toSeq == want)
  }
}
