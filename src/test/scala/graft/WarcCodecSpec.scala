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
    // non-numeric Content-Length is a framing error, not a NumberFormatException
    val badLen = ("WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: soon\r\n\r\n").getBytes
    val e3 = intercept[IllegalArgumentException](WarcCodec.parse(badLen))
    assert(e3.getMessage.contains("bad Content-Length"))
    // garbage version line
    val junk = ("HTTP/1.1 200 OK\r\n\r\n").getBytes
    intercept[IllegalArgumentException](WarcCodec.parse(junk))
  }

  // ---------------------------------------------------------------- .warc.gz

  test(".warc.gz: one gzip member per record; writeGz → parseGz round-trips") {
    val entries = Seq(
      ("http://g.test/1", "<html><p>first page body text</p></html>"),
      ("http://g.test/2", "<html><p>second page body text</p></html>"))
    val gz = WarcCodec.writeGz(entries)
    // member framing: warcinfo + one member per response, each ONE record
    val members = WarcCodec.gzipMembers(gz)
    assert(members.length == 3)
    members.foreach(m => assert(WarcCodec.parse(m).length == 1))
    assert(WarcCodec.parseGz(gz).head.recType == "warcinfo")
    assert(WarcCodec.responsesGz(gz).map(r => (r.targetUri, r.body)) == entries.toVector)
    // plain-vs-gz record equality: the framing is the only difference
    assert(WarcCodec.parseGz(gz) == WarcCodec.parse(WarcCodec.write(entries)))
  }

  /** Hand-built gzip member with a STORED deflate block, so `plain` appears
    * VERBATIM in the compressed stream — the honest scanner trap. */
  private def storedGzipMember(plain: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x1f, 0x8b, 0x08, 0x00, 0, 0, 0, 0, 0x00, 0xff).map(_.toByte))
    out.write(0x01) // BFINAL=1, BTYPE=00 (stored)
    out.write(plain.length & 0xff); out.write((plain.length >> 8) & 0xff)
    out.write(~plain.length & 0xff); out.write((~plain.length >> 8) & 0xff)
    out.write(plain)
    val crc = new java.util.zip.CRC32(); crc.update(plain)
    Seq(crc.getValue, plain.length.toLong).foreach { v =>
      (0 to 3).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    }
    out.toByteArray
  }

  test(".warc.gz: gzip magic INSIDE a member's compressed stream doesn't split it") {
    // a record payload carrying the RFC 1952 magic (1f 8b 08), shipped in a
    // stored block so those bytes sit verbatim mid-member — a signature
    // scanner would split there; bytesRead-driven member framing must not
    val magic = Array(0x1f, 0x8b, 0x08, 'X'.toInt).map(_.toByte)
    val rec1 = ("WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 4\r\n\r\n").getBytes ++
      magic ++ "\r\n\r\n".getBytes
    val m1 = storedGzipMember(rec1)
    val m2 = WarcCodec.gzipMember(
      ("WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n\r\nok\r\n\r\n").getBytes)
    // the trap is real: the magic occurs inside m1 past its own header
    val hit = m1.toSeq.sliding(3).indexWhere(w =>
      w(0) == 0x1f.toByte && w(1) == 0x8b.toByte && w(2) == 0x08.toByte, 1)
    assert(hit > 0 && hit < m1.length - 3)
    val recs = WarcCodec.parseGz(m1 ++ m2)
    assert(recs.length == 2 && recs(1).body == "ok")
  }

  test(".warc.gz: concatenated member boundaries are exact (bytesRead-driven)") {
    // hand-concatenate members with asymmetric sizes; splitting must land
    // exactly on the trailers, not on any scan heuristic
    val a = WarcCodec.gzipMember("A".getBytes)
    val b = WarcCodec.gzipMember(("B" * 100000).getBytes)
    val c = WarcCodec.gzipMember(Array.empty[Byte])
    val cat = a ++ b ++ c
    val ms = WarcCodec.gzipMembers(cat)
    assert(ms.map(_.length) == Vector(1, 100000, 0))
    assert(new String(ms(0)) == "A" && ms(1).forall(_ == 'B'.toByte))
  }

  test(".warc.gz: malformed members fail loudly with a byte offset") {
    val good = WarcCodec.writeGz(Seq(("http://g/1", "<p>x</p>")))
    // trailing garbage after the last member (GZIPInputStream would stop silently)
    val garbage = good ++ "this is not gzip at all".getBytes
    val e1 = intercept[IllegalArgumentException](WarcCodec.gzipMembers(garbage))
    assert(e1.getMessage.contains("malformed gzip member at byte") &&
      e1.getMessage.contains("bad gzip magic"))
    // truncated final member
    val cut = java.util.Arrays.copyOfRange(good, 0, good.length - 6)
    intercept[IllegalArgumentException](WarcCodec.gzipMembers(cut))
    // flipped payload byte -> CRC32 mismatch
    val flipped = good.clone()
    flipped(12) = (flipped(12) ^ 0x01).toByte
    val e3 = intercept[IllegalArgumentException](WarcCodec.gzipMembers(flipped))
    assert(e3.getMessage.contains("CRC32 mismatch") ||
      e3.getMessage.contains("deflate error"))
  }
}
