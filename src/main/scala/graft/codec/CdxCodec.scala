package graft.codec

/**
 * X74: CDX(J) index lines — the published Common Crawl index format that
 * production curation reads BEFORE touching shard bytes: one line per
 * capture, `<SURT key> <timestamp> <JSON>` where the JSON payload carries
 * url / status / mime / digest / filename / offset / length. Selecting on
 * the index and then range-reading only the chosen members is what makes
 * URL-first curation affordable — unselected records are never fetched,
 * let alone decompressed.
 *
 * This codec is the WRITE side (the X67 honest-synthesis discipline: the
 * fixture index is derived from the REAL member extents
 * [[WarcCodec.writeGzIndexed]] reports, and status/mime mirror what the
 * member actually says on the wire) plus the SURT transform. The engine's
 * READ side is deliberately not here: CDXJ parsing in the scan is plain
 * `split(line, ' ', 3)` + `from_json` — codegen'd Spark, no custom codec
 * needed (see the `d_cdx_select` query).
 */
object CdxCodec {

  final case class CdxEntry(
      url: String,
      timestamp: String, // 14-digit CC style, e.g. 20260101000000
      status: Int,
      mime: String,
      digest: String,    // md5 hex of the response body
      filename: String,  // shard-relative, CC style
      offset: Long,
      length: Long)

  /** SURT (Sort-friendly URI Reordering Transform) key subset: host labels
    * reversed and comma-joined, then `)` + path — `http://Blog.Example.CO.UK
    * /doc/7` → `uk,co,example,blog)/doc/7`. Scheme, default ports, fragments
    * and the query string are dropped (the CC index key convention for the
    * shapes this fixture emits); TOTAL on garbage: an unparseable url keys
    * as its lowercase self so an index line is never lost. */
  def surt(url: String): String = {
    val lower = url.toLowerCase(java.util.Locale.ROOT)
    val afterScheme = {
      val i = lower.indexOf("://")
      if (i < 0) lower else lower.substring(i + 3)
    }
    val hostEnd = afterScheme.indexWhere(c => c == '/' || c == '?' || c == '#')
    val (hostPort, rest) =
      if (hostEnd < 0) (afterScheme, "/")
      else (afterScheme.substring(0, hostEnd), afterScheme.substring(hostEnd))
    val host = hostPort.takeWhile(_ != ':')
    if (host.isEmpty || host.exists(_.isWhitespace)) lower
    else {
      val path = rest.takeWhile(c => c != '?' && c != '#') match {
        case "" => "/"
        case p  => p
      }
      host.split('.').reverse.mkString(",") + ")" + path
    }
  }

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** One CDXJ line. Field order is fixed so the output is byte-stable. */
  def formatLine(e: CdxEntry): String = {
    val json = s"""{"url": "${jsonEscape(e.url)}", "status": "${e.status}", """ +
      s""""mime": "${jsonEscape(e.mime)}", "digest": "${e.digest}", """ +
      s""""filename": "${jsonEscape(e.filename)}", "offset": "${e.offset}", """ +
      s""""length": "${e.length}"}"""
    s"${surt(e.url)} ${e.timestamp} $json"
  }

  /** The JSON payload schema for the engine's `from_json` read path. CC
    * CDXJ carries every value as a STRING (offsets included) — the scan
    * casts after parse. */
  val PayloadSchemaDdl: String =
    "url string, status string, mime string, digest string, " +
      "filename string, offset string, length string"

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
