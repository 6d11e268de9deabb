package graft

import java.nio.charset.StandardCharsets

import graft.codec.WarcCodec

/**
 * X78 WET writer + X77 re-crawl diff: the conversion-record writer must
 * frame one gzip member per record (derived shards stay member-splittable),
 * carry the WET headers (conversion type, text/plain, WARC-Refers-To back
 * at the source capture), and round-trip arbitrary UTF-8 text bit-exactly;
 * the re-crawl diff must reproduce the planted fates from the real index
 * digests.
 */
class WetRecrawlSpec extends SparkSpec {

  private val entries = Seq(
    "http://fixture.test/doc/1" -> "alpha beta gamma",
    "http://fixture.test/doc/2" -> "café — déjà vu", // UTF-8 multibyte
    "http://fixture.test/doc/3" -> "")

  test("writeWetGz frames one gzip member per record; conversions round-trip") {
    val bytes = WarcCodec.writeWetGz(entries)
    // warcinfo member + one member per conversion record
    assert(WarcCodec.gzipMembers(bytes).length == entries.length + 1)
    val back = WarcCodec.conversionsGz(bytes)
    assert(back.map(r => r.targetUri -> r.body) == entries.toVector)
    // responses view sees none of them
    assert(WarcCodec.responsesGz(bytes).isEmpty)
  }

  test("conversion records carry the WET headers and byte-correct Content-Length") {
    val bytes = WarcCodec.writeWetGz(entries.slice(1, 2)) // the multibyte one
    // gzipMembers returns each member DECOMPRESSED (it feeds parse directly)
    val plain = new String(WarcCodec.gzipMembers(bytes)(1), StandardCharsets.UTF_8)
    assert(plain.contains("WARC-Type: conversion"))
    assert(plain.contains("Content-Type: text/plain"))
    assert(plain.contains("WARC-Target-URI: http://fixture.test/doc/2"))
    // refers back at the deterministic response record id for that uri
    val uri = "http://fixture.test/doc/2"
    assert(plain.contains(s"WARC-Refers-To: <urn:graft:response:${uri.hashCode}>"))
    // Content-Length counts UTF-8 BYTES, not chars
    val text = entries(1)._2
    assert(plain.contains(
      s"Content-Length: ${text.getBytes(StandardCharsets.UTF_8).length}"))
    assert(text.length != text.getBytes(StandardCharsets.UTF_8).length)
  }

  test("d_cdx_recrawl reproduces the planted fates from real index digests") {
    val rows = SparkEntry.queries("d_cdx_recrawl")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, change) =>
      val expected =
        if (id >= 20000000L) "new"
        else if (id % 9 == 0) "gone"
        else if (id % 5 == 0) "changed"
        else "unchanged"
      assert(change == expected, s"doc $id")
    }
    // every fate occurs on the fixture
    assert(rows.values.toSet == Set("gone", "new", "changed", "unchanged"))
    // new captures are exactly the %17 plants shifted by 20M
    val newIds = rows.collect { case (id, "new") => id - 20000000L }.toSet
    assert(newIds.nonEmpty && newIds.forall(_ % 17 == 0))
  }

  test("d_cdx_recrawl_fetch reads only changed+new members and extracts their mains") {
    val diff = SparkEntry.queries("d_cdx_recrawl")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fetched = SparkEntry.queries("d_cdx_recrawl_fetch")(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSet
    val expected = diff.collect {
      case (id, "changed") => id
      case (id, "new") => id
    }.toSet
    assert(fetched == expected)
  }
}
