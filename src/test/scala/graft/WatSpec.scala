package graft

import java.nio.charset.StandardCharsets

import graft.codec.WarcCodec

/**
 * X101 WAT metadata shards: member framing, the metadata ingestion view,
 * WARC-Refers-To lineage back to the capture's response record, and the
 * JSON payload surviving the gzip round trip byte-exactly.
 */
class WatSpec extends SparkSpec {

  private val entries = Seq(
    "http://fixture.test/doc/1" ->
      """{"url":"http://fixture.test/doc/1","links":["http://a.org/x","http://b.org/y"]}""",
    "http://fixture.test/doc/2" ->
      """{"url":"http://fixture.test/doc/2","links":[]}""")

  test("writeWatGz frames one gzip member per metadata record; payloads round-trip") {
    val bytes = WarcCodec.writeWatGz(entries)
    assert(WarcCodec.gzipMembers(bytes).length == entries.length + 1) // + warcinfo
    val back = WarcCodec.metadataGz(bytes)
    assert(back.map(r => r.targetUri -> r.body) == entries.toVector)
    // the response and conversion views must NOT see metadata records
    assert(WarcCodec.responsesGz(bytes).isEmpty)
    assert(WarcCodec.conversionsGz(bytes).isEmpty)
  }

  test("metadata records carry the WAT headers and the response lineage") {
    val bytes = WarcCodec.writeWatGz(entries.take(1))
    val plain = new String(WarcCodec.gzipMembers(bytes)(1), StandardCharsets.UTF_8)
    assert(plain.contains("WARC-Type: metadata"))
    assert(plain.contains("Content-Type: application/json"))
    assert(plain.contains("WARC-Target-URI: http://fixture.test/doc/1"))
    // refers back at the deterministic response record id for that uri —
    // the WARC/WET/WAT trio of one capture cross-references
    val uri = "http://fixture.test/doc/1"
    assert(plain.contains(s"WARC-Refers-To: <urn:graft:response:${uri.hashCode}>"))
    assert(plain.contains(s"WARC-Record-ID: <urn:graft:metadata:${uri.hashCode}>"))
  }

  test("d_wat_roundtrip: the WAT-derived graph equals the direct WARC-derived graph") {
    val fromWat = SparkEntry.queries("d_wat_roundtrip")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val direct = SparkEntry.queries("d_warc_link_graph")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fromWat.nonEmpty)
    assert(fromWat == direct,
      s"only-in-wat=${fromWat -- direct} only-in-direct=${direct -- fromWat}")
  }
}
