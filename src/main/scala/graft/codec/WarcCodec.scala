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

  /** Synthesize a WARC/1.0 file: one warcinfo record, then one response
    * record per (uri, html) entry. Deterministic (fixed date, record ids
    * derived from the uri). */
  def write(entries: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def record(headers: Seq[(String, String)], payload: Array[Byte]): Unit = {
      val head = ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
        .mkString("", CRLF, CRLF) +
        s"Content-Length: ${payload.length}$CRLF$CRLF"
      out.write(head.getBytes(StandardCharsets.UTF_8))
      out.write(payload)
      out.write((CRLF + CRLF).getBytes(StandardCharsets.UTF_8))
    }
    val info = "software: graft-warc-synth/1.0"
    record(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> "<urn:graft:warcinfo:0>",
      "Content-Type" -> "application/warc-fields"),
      info.getBytes(StandardCharsets.UTF_8))
    entries.foreach { case (uri, html) =>
      val body = html.getBytes(StandardCharsets.UTF_8)
      val http = (s"HTTP/1.1 200 OK${CRLF}Content-Type: text/html; charset=utf-8$CRLF" +
        s"Content-Length: ${body.length}$CRLF$CRLF").getBytes(StandardCharsets.UTF_8)
      val payload = new Array[Byte](http.length + body.length)
      System.arraycopy(http, 0, payload, 0, http.length)
      System.arraycopy(body, 0, payload, http.length, body.length)
      record(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> uri,
        "WARC-Date" -> "2026-01-01T00:00:00Z",
        "WARC-Record-ID" -> s"<urn:graft:response:${uri.hashCode}>",
        "Content-Type" -> "application/http; msgtype=response"),
        payload)
    }
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
}
