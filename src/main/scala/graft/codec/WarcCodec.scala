package graft.codec

import java.nio.charset.StandardCharsets

/**
 * X67: WARC (ISO 28500) record codec — the wire format web corpora actually
 * arrive in (Common-Crawl-shaped): a WARC file is a sequence of records,
 * each `WARC/1.0` + CRLF headers + CRLF CRLF + Content-Length payload bytes
 * + CRLF CRLF. Response records wrap an HTTP/1.1 message whose own header
 * block precedes the HTML body. Pure JVM, both directions (the X9 codec
 * discipline): the synthesizer writes real records so the parser is
 * exercised on honest bytes, and the parser is what the ingestion operator
 * (`d_warc_ingest`) runs per file on executors.
 *
 * Parser discipline the spec pins:
 *  - record boundaries come from Content-Length ONLY — never from scanning
 *    for "WARC/1.0" in payloads (a page QUOTING a WARC header must not
 *    split the stream);
 *  - header names are case-insensitive; unknown headers are carried over;
 *  - non-response records (warcinfo, request, metadata) parse but are
 *    skipped by [[responses]];
 *  - the HTTP envelope splits at the first CRLF CRLF; the status code comes
 *    from the status line; non-200 responses surface with their status so
 *    the caller can route them;
 *  - malformed framing (missing blank line, short payload, bad length)
 *    throws with the byte offset — corrupt shards are a loud routing
 *    decision, not silent truncation.
 */
object WarcCodec {

  final case class WarcRecord(
      recType: String,
      targetUri: String,
      httpStatus: Int,     // -1 for non-HTTP records
      contentType: String, // the HTTP payload content type ("" if none)
      body: String)        // HTTP body (or raw payload for non-HTTP records)

  private val CRLF = "\r\n"

  private def recordBytes(headers: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
      .mkString("", CRLF, CRLF) +
      s"Content-Length: ${payload.length}$CRLF$CRLF"
    val hb = head.getBytes(StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(hb.length + payload.length + 4)
    out.write(hb)
    out.write(payload)
    out.write((CRLF + CRLF).getBytes(StandardCharsets.UTF_8))
    out.toByteArray
  }

  private def warcinfoRecord: Array[Byte] = recordBytes(Seq(
    "WARC-Type" -> "warcinfo",
    "WARC-Date" -> "2026-01-01T00:00:00Z",
    "WARC-Record-ID" -> "<urn:graft:warcinfo:0>",
    "Content-Type" -> "application/warc-fields"),
    "software: graft-warc-synth/1.0".getBytes(StandardCharsets.UTF_8))

  private def responseRecord(uri: String, html: String): Array[Byte] = {
    val body = html.getBytes(StandardCharsets.UTF_8)
    val http = (s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html; charset=utf-8$CRLF" +
      s"Content-Length: ${body.length}$CRLF$CRLF").getBytes(StandardCharsets.UTF_8)
    val payload = new Array[Byte](http.length + body.length)
    System.arraycopy(http, 0, payload, 0, http.length)
    System.arraycopy(body, 0, payload, http.length, body.length)
    recordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:graft:response:${uri.hashCode}>",
      "Content-Type" -> "application/http; msgtype=response"),
      payload)
  }

  /** Synthesize a WARC/1.0 file: one warcinfo record, then one response
    * record per (uri, html) entry. Deterministic (fixed date, record ids
    * derived from the uri). */
  def write(entries: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(warcinfoRecord)
    entries.foreach { case (uri, html) => out.write(responseRecord(uri, html)) }
    out.toByteArray
  }

  /** Parse every record of a WARC file. Throws IllegalArgumentException
    * (with byte offset) on malformed framing. */
  def parse(bytes: Array[Byte]): Vector[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var i = 0
    val n = bytes.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WARC at byte $i: $msg")
    def find(pat: String, from: Int): Int = {
      val p = pat.getBytes(StandardCharsets.UTF_8)
      var j = from
      while (j <= n - p.length) {
        var k = 0
        while (k < p.length && bytes(j + k) == p(k)) k += 1
        if (k == p.length) return j
        j += 1
      }
      -1
    }
    while (i < n) {
      // tolerate trailing CRLFs after the final record
      while (i < n && (bytes(i) == '\r' || bytes(i) == '\n')) i += 1
      if (i >= n) return out.result()
      val headEnd = find(CRLF + CRLF, i)
      if (headEnd < 0) fail("no header terminator")
      val head = new String(bytes, i, headEnd - i, StandardCharsets.UTF_8)
      val lines = head.split(CRLF)
      if (!lines.headOption.exists(_.startsWith("WARC/"))) fail(s"bad version line '${lines.headOption.getOrElse("")}'")
      val headers: Map[String, String] = lines.drop(1).flatMap { l =>
        val cut = l.indexOf(':')
        if (cut < 0) None else Some(l.substring(0, cut).trim.toLowerCase -> l.substring(cut + 1).trim)
      }.toMap
      val len = headers.get("content-length") match {
        case None    => fail("missing Content-Length")
        case Some(v) => v.toIntOption.getOrElse(fail(s"bad Content-Length '$v'"))
      }
      val payloadStart = headEnd + 4
      if (payloadStart + len > n) fail(s"payload overruns file (len $len)")
      val payload = java.util.Arrays.copyOfRange(bytes, payloadStart, payloadStart + len)
      val recType = headers.getOrElse("warc-type", "")
      val uri = headers.getOrElse("warc-target-uri", "")
      if (recType == "response" &&
          headers.getOrElse("content-type", "").startsWith("application/http")) {
        val text = new String(payload, StandardCharsets.UTF_8)
        val cut = text.indexOf(CRLF + CRLF)
        val (httpHead, body) =
          if (cut < 0) (text, "") else (text.substring(0, cut), text.substring(cut + 4))
        val status = httpHead.split(CRLF).headOption
          .flatMap(_.split(" ").lift(1)).flatMap(_.toIntOption).getOrElse(-1)
        val ct = httpHead.split(CRLF).drop(1).flatMap { l =>
          val c = l.indexOf(':')
          if (c < 0) None
          else if (l.substring(0, c).trim.equalsIgnoreCase("content-type"))
            Some(l.substring(c + 1).trim)
          else None
        }.headOption.getOrElse("")
        out += WarcRecord(recType, uri, status, ct, body)
      } else {
        out += WarcRecord(recType, uri, -1, "",
          new String(payload, StandardCharsets.UTF_8))
      }
      i = payloadStart + len
    }
    out.result()
  }

  /** The ingestion view: 200-status HTTP responses only. */
  def responses(bytes: Array[Byte]): Vector[WarcRecord] =
    parse(bytes).filter(r => r.recType == "response" && r.httpStatus == 200)

  // ---------------------------------------------------------------- .warc.gz
  //
  // Real Common Crawl shards are NOT one gzip stream: they are a
  // concatenation of gzip members, ONE MEMBER PER WARC RECORD (the ISO
  // 28500 annex / CC convention), so a reader can split work at member
  // boundaries without decompressing the whole shard. JDK GZIPInputStream
  // is the wrong tool for honest framing: it silently FUSES concatenated
  // members into one stream and stops quietly at trailing garbage — so the
  // member walk below parses RFC 1952 headers by hand, inflates each
  // member with a raw Inflater (the PixelCodec zlib discipline), and
  // verifies every CRC32 + ISIZE trailer, failing loudly with the byte
  // offset on any framing damage.

  /** Compress one gzip member. JDK GZIPOutputStream writes a fixed header
    * (MTIME 0, no optional fields), so output is deterministic. */
  def gzipMember(plain: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(plain.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(plain)
    gz.close()
    bos.toByteArray
  }

  /** Split a concatenation of gzip members at RFC 1952 member boundaries.
    * Returns each member's decompressed payload, in order. Throws
    * IllegalArgumentException with the byte offset on malformed framing
    * (bad magic, truncated deflate, CRC or ISIZE mismatch). */
  def gzipMembers(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    val n = bytes.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed gzip member at byte $i: $msg")
    def u8(p: Int): Int = bytes(p) & 0xff
    def u32(p: Int): Long =
      (u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16) | (u8(p + 3) << 24)).toLong & 0xffffffffL
    while (i < n) {
      if (n - i < 10) fail("truncated gzip header")
      if (u8(i) != 0x1f || u8(i + 1) != 0x8b)
        fail(f"bad gzip magic ${u8(i)}%02x ${u8(i + 1)}%02x")
      if (u8(i + 2) != 8) fail(s"unsupported compression method ${u8(i + 2)}")
      val flg = u8(i + 3)
      i += 10
      if ((flg & 4) != 0) { // FEXTRA: little-endian XLEN then XLEN bytes
        if (n - i < 2) fail("truncated FEXTRA")
        i += 2 + (u8(i) | (u8(i + 1) << 8))
      }
      if ((flg & 8) != 0) { while (i < n && bytes(i) != 0) i += 1; i += 1 } // FNAME
      if ((flg & 16) != 0) { while (i < n && bytes(i) != 0) i += 1; i += 1 } // FCOMMENT
      if ((flg & 2) != 0) i += 2 // FHCRC
      if (i > n) fail("truncated gzip header fields")
      val inf = new java.util.zip.Inflater(true)
      val body = new java.io.ByteArrayOutputStream(64 * 1024)
      try {
        inf.setInput(bytes, i, n - i)
        val buf = new Array[Byte](64 * 1024)
        while (!inf.finished()) {
          val got =
            try inf.inflate(buf)
            catch { case e: java.util.zip.DataFormatException =>
              fail(s"deflate error: ${e.getMessage}") }
          if (got > 0) body.write(buf, 0, got)
          else if (inf.needsInput()) fail("truncated deflate stream")
        }
        i += inf.getBytesRead.toInt
      } finally inf.end()
      if (n - i < 8) fail("truncated gzip trailer")
      val plain = body.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(plain)
      if (u32(i) != crc.getValue)
        fail(f"CRC32 mismatch (stored ${u32(i)}%08x, computed ${crc.getValue}%08x)")
      if (u32(i + 4) != (plain.length.toLong & 0xffffffffL))
        fail(s"ISIZE mismatch (stored ${u32(i + 4)}, actual ${plain.length})")
      i += 8
      out += plain
    }
    out.result()
  }

  /** Synthesize a Common-Crawl-shaped `.warc.gz`: one gzip member per
    * record (warcinfo first, then one response per entry), concatenated. */
  def writeGz(entries: Seq[(String, String)]): Array[Byte] =
    writeGzIndexed(entries.map(e => GzEntry(e._1, e._2)))._1

  /** A response member to synthesize: status/mime parameterize the HTTP
    * status line and Content-Type header, so index-bearing fixtures stay
    * HONEST — whatever a CDX line claims about a member is what the member
    * actually says on the wire. */
  final case class GzEntry(uri: String, html: String, status: Int = 200,
      mime: String = "text/html; charset=utf-8")

  private val ReasonPhrases = Map(200 -> "OK", 301 -> "Moved Permanently",
    404 -> "Not Found", 500 -> "Internal Server Error")

  private def responseRecordWith(e: GzEntry): Array[Byte] = {
    val body = e.html.getBytes(StandardCharsets.UTF_8)
    val reason = ReasonPhrases.getOrElse(e.status, "Unknown")
    val http = (s"HTTP/1.1 ${e.status} $reason${CRLF}Content-Type: ${e.mime}$CRLF" +
      s"Content-Length: ${body.length}$CRLF$CRLF").getBytes(StandardCharsets.UTF_8)
    val payload = new Array[Byte](http.length + body.length)
    System.arraycopy(http, 0, payload, 0, http.length)
    System.arraycopy(body, 0, payload, http.length, body.length)
    recordBytes(Seq(
      "WARC-Type" -> "response",
      "WARC-Target-URI" -> e.uri,
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:graft:response:${e.uri.hashCode}>",
      "Content-Type" -> "application/http; msgtype=response"), payload)
  }

  /** X74: like [[writeGz]] but also returns each response member's byte
    * EXTENT (uri, offset, length) into the shard — exactly what a CDX(J)
    * index records so a consumer can range-read single members without
    * touching the rest of the file. The leading warcinfo member is not
    * indexed (CC indexes capture records, not file metadata). */
  def writeGzIndexed(entries: Seq[GzEntry])
      : (Array[Byte], Seq[(String, Long, Long)]) = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(gzipMember(warcinfoRecord))
    val extents = entries.map { e =>
      val off = out.size().toLong
      out.write(gzipMember(responseRecordWith(e)))
      (e.uri, off, out.size().toLong - off)
    }
    (out.toByteArray, extents)
  }

  /** Parse a `.warc.gz`: split gzip members, then parse each member's
    * records independently — a WARC record never spans members (the CC
    * framing guarantee this codec exists to honor). */
  def parseGz(bytes: Array[Byte]): Vector[WarcRecord] =
    gzipMembers(bytes).flatMap(parse)

  /** The ingestion view over `.warc.gz`: 200-status HTTP responses only. */
  def responsesGz(bytes: Array[Byte]): Vector[WarcRecord] =
    parseGz(bytes).filter(r => r.recType == "response" && r.httpStatus == 200)

  // ------------------------------------------------------ X78 WET writing

  /** X78: a WET-style `conversion` record (ISO 28500 §6.8 / the Common
    * Crawl WET convention): the extracted plain text of a capture, typed
    * `conversion` with `Content-Type: text/plain`, pointing back at the
    * source response via WARC-Refers-To (the same deterministic record id
    * [[responseRecordWith]] assigns that uri). */
  private def conversionRecord(uri: String, text: String): Array[Byte] =
    recordBytes(Seq(
      "WARC-Type" -> "conversion",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:graft:conversion:${uri.hashCode}>",
      "WARC-Refers-To" -> s"<urn:graft:response:${uri.hashCode}>",
      "Content-Type" -> "text/plain"),
      text.getBytes(StandardCharsets.UTF_8))

  /** X78 writer: a WET shard as CONCATENATED GZIP MEMBERS (warcinfo first,
    * then one conversion record per (uri, text) entry — one member per
    * record), so the DERIVED text shards keep the same member-parallel
    * splittability the raw `.warc.gz` reader relies on. */
  def writeWetGz(entries: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(gzipMember(warcinfoRecord))
    entries.foreach { case (uri, text) =>
      out.write(gzipMember(conversionRecord(uri, text)))
    }
    out.toByteArray
  }

  /** The WET ingestion view: conversion records (their body IS the plain
    * text — non-HTTP records carry the raw payload through [[parse]]). */
  def conversionsGz(bytes: Array[Byte]): Vector[WarcRecord] =
    parseGz(bytes).filter(_.recType == "conversion")

  // ------------------------------------------------------ X101 WAT writing

  /** X101: a WAT-style `metadata` record (ISO 28500 §6.9 / the Common
    * Crawl WAT convention): JSON metadata ABOUT a capture — canonically
    * the harvested outlink set — typed `metadata` with
    * `Content-Type: application/json`, pointing back at the source
    * response via WARC-Refers-To (the same deterministic id scheme the
    * response/conversion records share, so the WARC/WET/WAT trio of one
    * capture cross-references). */
  private def metadataRecord(uri: String, json: String): Array[Byte] =
    recordBytes(Seq(
      "WARC-Type" -> "metadata",
      "WARC-Target-URI" -> uri,
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:graft:metadata:${uri.hashCode}>",
      "WARC-Refers-To" -> s"<urn:graft:response:${uri.hashCode}>",
      "Content-Type" -> "application/json"),
      json.getBytes(StandardCharsets.UTF_8))

  /** X101 writer: a WAT shard as CONCATENATED GZIP MEMBERS (warcinfo
    * first, then one metadata record per (uri, json) entry) — the derived
    * metadata shards keep the member-parallel splittability of the raw
    * `.warc.gz` (the X78 WET discipline applied to the metadata plane). */
  def writeWatGz(entries: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(gzipMember(warcinfoRecord))
    entries.foreach { case (uri, json) =>
      out.write(gzipMember(metadataRecord(uri, json)))
    }
    out.toByteArray
  }

  /** The WAT ingestion view: metadata records (body = the JSON payload). */
  def metadataGz(bytes: Array[Byte]): Vector[WarcRecord] =
    parseGz(bytes).filter(_.recType == "metadata")
}
