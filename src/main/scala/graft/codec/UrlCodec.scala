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
}
