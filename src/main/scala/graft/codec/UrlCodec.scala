package graft.codec

import java.util.Locale

/**
 * X68: URL canonicalization + registered-domain extraction for web-corpus
 * curation (round-13 directive #2; no reference analog — the
 * FineWeb/RefinedWeb-shaped URL hygiene stage: real pipelines filter and
 * dedup by URL before ever parsing a page, because it is the only per-page
 * key that exists pre-extraction). Pure JVM, deterministic, and TOTAL: any
 * string is accepted; non-hierarchical inputs (no "scheme://") pass
 * through trimmed and de-fragmented rather than throwing — a crawl column
 * always contains garbage and a per-row expression must not kill the scan.
 *
 * `normalize` applies exactly these rewrites (each stated so a SQL oracle
 * can replay them on planted fixtures):
 *  - trim surrounding whitespace; drop the fragment (first '#' onward);
 *  - lowercase the scheme and the host (userinfo, path, query untouched —
 *    they are case-sensitive per RFC 3986);
 *  - strip the scheme's default port (http:80, https:443);
 *  - an empty path becomes "/"; a trailing slash on a non-root path is
 *    dropped;
 *  - tracking parameters are removed: any name with the "utm_" prefix plus
 *    the fixed id set below; surviving params keep their original order
 *    (no sort — reordering changes semantics for duplicate names); an
 *    emptied query drops its '?';
 *  - percent-encodings are NOT rewritten (never touch bytes we don't own).
 *
 * Idempotent by construction: every rewrite's output is a fixpoint of that
 * rewrite (lowercased stays lowercased, a stripped port/param/fragment
 * cannot reappear), pinned by UrlCodecSpec's property test.
 */
object UrlCodec {

  /** Tracking-parameter names stripped by [[normalize]] (case-insensitive),
    * in addition to the `utm_` prefix family. Only UNAMBIGUOUS click/
    * campaign ids belong here: a generic name like `ref` is often a
    * semantic parameter (GitHub `?ref=branch`, pagination/referrer-content
    * params), and stripping it would canonicalize genuinely distinct
    * resources together — URL dedup would then over-merge on real crawls.
    * `ref_src` stays (the Twitter `twsrc` campaign tag, never a resource
    * selector). */
  val TrackingIds: Set[String] =
    Set("gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref_src", "spm")

  private def isTracking(name: String): Boolean = {
    val n = name.toLowerCase(Locale.ROOT)
    n.startsWith("utm_") || TrackingIds.contains(n)
  }

  def normalize(url: String): String = {
    val noWs = url.trim
    val hashAt = noWs.indexOf('#')
    // re-trim after the fragment strip: "x #f" must not leave "x " (the
    // idempotency property caught exactly this)
    val trimmed = (if (hashAt >= 0) noWs.substring(0, hashAt) else noWs).trim
    val sep = trimmed.indexOf("://")
    if (sep <= 0) return trimmed
    val rawScheme = trimmed.substring(0, sep)
    if (!rawScheme.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return trimmed // "://" mid-sentence, not a scheme — leave it alone
    val scheme = rawScheme.toLowerCase(Locale.ROOT)
    val rest = trimmed.substring(sep + 3)
    val authEnd0 = rest.indexWhere(c => c == '/' || c == '?')
    val authEnd = if (authEnd0 < 0) rest.length else authEnd0
    val authority = rest.substring(0, authEnd)
    val tail = rest.substring(authEnd) // "", or starts with '/' or '?'
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    var hostPort = authority.substring(at + 1).toLowerCase(Locale.ROOT)
    val defPort =
      if (scheme == "http") ":80" else if (scheme == "https") ":443" else null
    if (defPort != null && hostPort.endsWith(defPort))
      hostPort = hostPort.substring(0, hostPort.length - defPort.length)
    val qAt = tail.indexOf('?')
    var path = if (qAt >= 0) tail.substring(0, qAt) else tail
    val query = if (qAt >= 0) tail.substring(qAt + 1) else null
    if (path.isEmpty) path = "/"
    if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)
    val keptQuery =
      if (query == null) null
      else {
        val kept = query.split("&", -1)
          .filter(p => p.nonEmpty && !isTracking(p.split("=", 2)(0)))
        if (kept.isEmpty) null else kept.mkString("&")
      }
    scheme + "://" + userinfo + hostPort + path +
      (if (keptQuery == null) "" else "?" + keptQuery)
  }

  /** Host of a URL, after [[normalize]] ("" when not hierarchical). A port
    * is stripped only when everything after the last ':' is digits, so
    * bracketed IPv6 literals ("[::1]") survive intact. */
  def host(url: String): String = {
    val n = normalize(url)
    val sep = n.indexOf("://")
    if (sep <= 0) return ""
    val rest = n.substring(sep + 3)
    val end0 = rest.indexWhere(c => c == '/' || c == '?')
    val auth = if (end0 < 0) rest else rest.substring(0, end0)
    val hp = auth.substring(auth.lastIndexOf('@') + 1)
    val colon = hp.lastIndexOf(':')
    if (colon >= 0 && colon + 1 < hp.length &&
        hp.substring(colon + 1).forall(_.isDigit))
      hp.substring(0, colon)
    else hp
  }

  /** Registered domain = one label + the LONGEST matching public suffix
    * from `suffixes` (dot-boundary match, so "co.uk" never matches
    * "marco.uk"); a host with no matching suffix falls back to its last
    * label as the suffix (the PSL "*" default rule). A host that IS a
    * suffix, or has no dots, returns itself. The suffix list is a fixture
    * subset passed by the caller — a literal the SQL oracle replays — not
    * a bundled copy of the full Mozilla list. */
  def registeredDomain(host: String, suffixes: Seq[String]): String = {
    val h0 = host.toLowerCase(Locale.ROOT)
    val h = if (h0.endsWith(".")) h0.substring(0, h0.length - 1) else h0
    if (h.isEmpty) return ""
    val matching = suffixes.filter(sfx => h == sfx || h.endsWith("." + sfx))
    val sfx =
      if (matching.nonEmpty) matching.maxBy(_.length)
      else h.substring(h.lastIndexOf('.') + 1)
    if (h == sfx) h
    else {
      val prefix = h.substring(0, h.length - sfx.length - 1)
      prefix.substring(prefix.lastIndexOf('.') + 1) + "." + sfx
    }
  }

  /** X85: RFC 3986 §5.2.4 remove_dot_segments over a path (no query). The
    * standard output-buffer algorithm; TOTAL on any string. */
  def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        val seg = if (next < 0) in else in.substring(0, next)
        out += seg
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.mkString
  }

  /** True iff `s` begins with a URI scheme ("letter(letter|digit|+|-|.)* :")
    * before any '/', '?' or '#'. */
  private def hasScheme(s: String): Boolean = {
    val colon = s.indexOf(':')
    if (colon <= 0) return false
    val head = s.substring(0, colon)
    if (!head.charAt(0).isLetter) return false
    if (!head.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
      return false
    val stop = s.indexWhere(c => c == '/' || c == '?' || c == '#')
    stop < 0 || colon < stop
  }

  /** Dot-segment removal applied to a full URL's path (query preserved);
    * non-hierarchical URLs (mailto:…) pass through untouched. */
  private def withDotsRemoved(url: String): String = {
    val sep = url.indexOf("://")
    if (sep <= 0) return url
    val rest = url.substring(sep + 3)
    val pathAt = rest.indexWhere(c => c == '/' || c == '?')
    if (pathAt < 0) return url
    val origin = url.substring(0, sep + 3) + rest.substring(0, pathAt)
    val tail = rest.substring(pathAt)
    val qAt = tail.indexOf('?')
    val path = if (qAt >= 0) tail.substring(0, qAt) else tail
    val query = if (qAt >= 0) tail.substring(qAt) else ""
    origin + removeDotSegments(path) + query
  }

  /** X85: RFC 3986 §5.2 relative-reference resolution — the step between
    * anchor harvest (X80) and URL hygiene (X68): a crawled page's relative
    * hrefs only become graph edges after resolving against the capture URI.
    * TOTAL and fragment-dropping (this codec never keeps fragments). Stated
    * semantics, each replayed by spec/oracle:
    *  - ref with its own scheme → ref, path dot-segments removed
    *    (non-hierarchical refs like mailto: pass through whole);
    *  - base not hierarchical (no "scheme://") → ref unchanged (a garbage
    *    base can't anchor anything);
    *  - "//host/…" (network-path) → base scheme + ":" + ref;
    *  - "" or "#f" → base (sans fragment), query kept;
    *  - "?q" → base path + new query;
    *  - "/abs" → base origin + remove_dot_segments("/abs");
    *  - relative → merge(base directory, ref), dot segments removed. */
  def resolve(base: String, ref0: String): String = {
    val refT = ref0.trim
    val refH = refT.indexOf('#')
    val ref = (if (refH >= 0) refT.substring(0, refH) else refT).trim
    if (hasScheme(ref)) return withDotsRemoved(ref)
    val bT = base.trim
    val bH = bT.indexOf('#')
    val b = (if (bH >= 0) bT.substring(0, bH) else bT).trim
    val sep = b.indexOf("://")
    if (sep <= 0) return ref
    if (ref.startsWith("//")) return withDotsRemoved(b.substring(0, sep + 1) + ref)
    val rest = b.substring(sep + 3)
    val pathAt0 = rest.indexWhere(c => c == '/' || c == '?')
    val pathAt = if (pathAt0 < 0) rest.length else pathAt0
    val origin = b.substring(0, sep + 3) + rest.substring(0, pathAt)
    val tail = rest.substring(pathAt)
    val qAt = tail.indexOf('?')
    val basePath0 = if (qAt >= 0) tail.substring(0, qAt) else tail
    val baseQuery = if (qAt >= 0) tail.substring(qAt) else ""
    val basePath = if (basePath0.isEmpty) "/" else basePath0
    if (ref.isEmpty) return origin + basePath + baseQuery
    if (ref.startsWith("?")) return origin + basePath + ref
    val refQAt = ref.indexOf('?')
    val refPath = if (refQAt >= 0) ref.substring(0, refQAt) else ref
    val refQuery = if (refQAt >= 0) ref.substring(refQAt) else ""
    if (refPath.startsWith("/"))
      return origin + removeDotSegments(refPath) + refQuery
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    origin + removeDotSegments(dir + refPath) + refQuery
  }
}
