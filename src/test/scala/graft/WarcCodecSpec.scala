package graft

import graft.codec.WarcCodec
import graft.codec.WarcCodec.WarcRecord

/**
 * X67 WARC codec: framing discipline (Content-Length-driven, never payload
 * scanning), header case-insensitivity, record-type routing, HTTP envelope
 * stripping, and loud failure on malformed bytes.
 */
class WarcCodecSpec extends SparkSpec {

  test("write → parse round-trips, warcinfo present but skipped by responses") {
    val entries = Seq(
      ("http://a.test/1", "<html><p>one</p></html>"),
      ("http://a.test/2", "<html><p>two</p></html>"))
    val bytes = WarcCodec.write(entries)
    val all = WarcCodec.parse(bytes)
    assert(all.length == 3 && all.head.recType == "warcinfo")
    val resp = WarcCodec.responses(bytes)
    assert(resp.map(r => (r.targetUri, r.body)) == entries.toVector)
    assert(resp.forall(r => r.httpStatus == 200 &&
      r.contentType.startsWith("text/html")))
  }

  test("framing is Content-Length-driven: a payload QUOTING WARC headers doesn't split") {
    val trap = "<html><p>literal WARC/1.0\r\nWARC-Type: response\r\n\r\nquoted</p></html>"
    val bytes = WarcCodec.write(Seq(("http://t/1", trap), ("http://t/2", "<p>next</p>")))
    val resp = WarcCodec.responses(bytes)
    assert(resp.map(_.targetUri) == Vector("http://t/1", "http://t/2"))
    assert(resp.head.body == trap)
  }

  test("non-200 responses parse with their status and are routed out") {
    val body = "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n<p>gone</p>"
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://t/x\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${body.getBytes.length}\r\n\r\n$body\r\n\r\n").getBytes
    val all = WarcCodec.parse(rec)
    assert(all == Vector(WarcRecord("response", "http://t/x", 404, "text/html", "<p>gone</p>")))
    assert(WarcCodec.responses(rec).isEmpty)
  }

  test("header names are case-insensitive") {
    val body = "HTTP/1.1 200 OK\r\ncontent-type: text/html\r\n\r\nhi"
    val rec = ("WARC/1.0\r\nwarc-type: response\r\nWaRc-TaRgEt-UrI: http://t/y\r\n" +
      "CONTENT-TYPE: application/http\r\n" +
      s"content-length: ${body.getBytes.length}\r\n\r\n$body\r\n\r\n").getBytes
    val resp = WarcCodec.responses(rec)
    assert(resp == Vector(WarcRecord("response", "http://t/y", 200, "text/html", "hi")))
  }

  test("malformed framing fails loudly with a byte offset") {
    val good = WarcCodec.write(Seq(("http://t/1", "<p>x</p>")))
    // truncate mid-payload: length now overruns
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 12)
    val e1 = intercept[IllegalArgumentException](WarcCodec.parse(cut))
    assert(e1.getMessage.contains("malformed WARC at byte"))
    // drop the Content-Length header entirely
    val noLen = ("WARC/1.0\r\nWARC-Type: metadata\r\n\r\npayload\r\n\r\n").getBytes
    val e2 = intercept[IllegalArgumentException](WarcCodec.parse(noLen))
    assert(e2.getMessage.contains("Content-Length"))
    // garbage version line
    val junk = ("HTTP/1.1 200 OK\r\n\r\n").getBytes
    intercept[IllegalArgumentException](WarcCodec.parse(junk))
  }
}
