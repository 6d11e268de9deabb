package graft.codec

import scala.collection.mutable

/**
 * HTML main-content extraction (round-12 directive #1; no reference analog —
 * the reference processes catalog JSON only; this is the jusText/trafilatura-
 * shaped entry stage of a web corpus, built with the X9 codec discipline:
 * pure JVM, single pass, no libraries).
 *
 * Stage 1 — block segmentation (the parser):
 *  - one left-to-right pass; tags are scanned with quote-aware attribute
 *    handling (a '>' inside a quoted attribute value does not close the tag);
 *  - `<script> <style> <noscript> <template>` contents are skipped to the
 *    matching close tag (case-insensitive); comments `<!-- -->`, doctypes
 *    `<!…>` and processing instructions `<?…>` are skipped;
 *  - a fixed set of BLOCK-level tags (open or close, either case) ends the
 *    current text block; all other tags (`<a> <b> <span>` …, and any unknown
 *    tag) are inline and invisible;
 *  - text runs are entity-decoded (`&amp;`-style named, `&#233;` decimal,
 *    `&#xE9;` hex; unknown entities stay literal) and whitespace-collapsed
 *    (any run of whitespace → one space, blocks trimmed); `&nbsp;` decodes
 *    to a plain space so it collapses like one;
 *  - characters inside `<a>…</a>` are counted per block (nesting-depth
 *    tracked) — the link-density signal. Counts exclude spaces, so they are
 *    insensitive to whitespace-collapse details.
 *
 * Stage 2 — context-free block classification (what the SQL oracle replays):
 * a block is MAIN CONTENT iff
 *  - it has at least `minChars` non-space characters, and
 *  - link density ≤ `maxLinkPct`% (100·linkChars ≤ maxLinkPct·nChars), and
 *  - stopword density ≥ `minStopPct`% of its whitespace tokens, lowercased,
 *    against the fixed [[HtmlCodec.Stopwords]] list (integer cross-multiply
 *    — no float thresholds, so the oracle compare is exact).
 * Classification is deliberately per-block (no jusText neighbor
 * reclassification pass): context-free semantics are what lets a SQL oracle
 * state the expected output exactly; the context pass buys little once
 * blocks segment on ALL block tags.
 *
 * [[mainText]] returns the good blocks joined with '\n'.
 */
object HtmlCodec {

  /** One segmented block: collapsed text, non-space chars, non-space chars
    * inside anchors. */
  final case class Block(text: String, nChars: Int, linkChars: Int)

  /** Fixed stopword list for the density signal — mirrored verbatim in the
    * d_html_extract oracle SQL; keep the two in sync. */
  val Stopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "in", "is", "it", "of", "on", "or", "that", "the", "this",
    "to", "was", "were", "will", "with")

  private val BlockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figure", "figcaption", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hr", "html",
    "li", "main", "nav", "ol", "p", "pre", "section", "table", "tbody",
    "td", "tfoot", "th", "thead", "title", "tr", "ul", "body")

  private val RawTextTags: Set[String] = Set("script", "style", "noscript", "template")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "laquo" -> "«", "raquo" -> "»",
    "euro" -> "€", "deg" -> "°", "middot" -> "·", "sect" -> "§")

  /** Segment `html` into text blocks (stage 1). Tolerant of malformed
    * markup: unclosed tags, stray '<', unterminated comments/raw-text
    * sections (consume to end), attribute values containing '>'. */
  def blocks(html: String): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    val lower = html.toLowerCase // one pass, for raw-text close-tag search
    val sb = new java.lang.StringBuilder
    var nChars = 0
    var linkChars = 0
    var pendingSpace = false
    var linkDepth = 0
    val n = html.length

    def flush(): Unit = {
      if (sb.length() > 0) { out += Block(sb.toString, nChars, linkChars) }
      sb.setLength(0); nChars = 0; linkChars = 0; pendingSpace = false
    }

    def appendChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) { if (sb.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
        nChars += 1
        if (linkDepth > 0) linkChars += 1
      }
    }

    /** Decode the entity starting at `amp` (index of '&'); returns the index
      * just past it, appending the decoded text. Unknown/unterminated
      * entities append '&' literally and advance by one. */
    def entity(amp: Int): Int = {
      val semi = html.indexOf(';', amp + 1)
      if (semi < 0 || semi - amp > 12) { appendChar('&'); return amp + 1 }
      val body = html.substring(amp + 1, semi)
      val decoded: Option[String] =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
          catch { case _: Exception => None }
        else if (body.startsWith("#"))
          try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
          catch { case _: Exception => None }
        else Entities.get(body)
      decoded match {
        case Some(s) => s.foreach(appendChar); semi + 1
        case None    => appendChar('&'); amp + 1
      }
    }

    /** Scan a tag from `lt` (index of '<'); returns index just past '>'.
      * Quote-aware: '>' inside '…' or "…" attribute values doesn't close. */
    def scanTag(lt: Int): (Int, String, Boolean, Boolean) = {
      var i = lt + 1
      val closing = i < n && html.charAt(i) == '/'
      if (closing) i += 1
      val nameStart = i
      while (i < n && (html.charAt(i).isLetterOrDigit)) i += 1
      val name = html.substring(nameStart, i).toLowerCase
      var quote: Char = 0
      var selfClosed = false
      while (i < n && (quote != 0 || html.charAt(i) != '>')) {
        val c = html.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        i += 1
      }
      if (i > lt + 1 && i <= n) {
        var j = i - 1
        while (j > lt && Character.isWhitespace(html.charAt(j))) j -= 1
        selfClosed = html.charAt(j) == '/'
      }
      (if (i < n) i + 1 else n, name, closing, selfClosed)
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n &&
          (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?' ||
           html.charAt(i + 1) == '/' || html.charAt(i + 1).isLetter)) {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?') {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else {
          val (next, name, closing, selfClosed) = scanTag(i)
          i = next
          if (name.isEmpty) { /* "</>" or "< >": ignore */ }
          else if (!closing && !selfClosed && RawTextTags(name)) {
            // skip raw-text content to the matching close tag
            val close = lower.indexOf("</" + name, i)
            if (close < 0) i = n
            else {
              val gt = html.indexOf('>', close)
              i = if (gt < 0) n else gt + 1
            }
            if (BlockTags(name)) flush()
          } else {
            if (name == "a") {
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else if (!selfClosed) linkDepth += 1
            }
            if (BlockTags(name)) flush()
          }
        }
      } else if (c == '&') {
        i = entity(i)
      } else {
        appendChar(c)
        i += 1
      }
    }
    flush()
    out.result()
  }

  /** One harvested hyperlink: raw href attribute value (NOT entity-decoded —
    * URL percent/entity bytes are the URL ops' business, never rewritten
    * here) and the entity-decoded, whitespace-collapsed, trimmed anchor
    * text. */
  final case class Anchor(href: String, text: String)

  /** X80: anchor (hyperlink) harvest — the link-extraction pass of a web
    * corpus (outlink graph, anchor-text weak labels). Same grammar as
    * [[blocks]]: comments/doctypes/PIs skipped, raw-text sections
    * (`<script>`…) skipped to their close tag, quote-aware attribute
    * scanning (a '>' inside a quoted value does not close the tag), and the
    * same entity decoding + whitespace collapse for the anchor TEXT.
    * Anchor-specific semantics (each pinned by LinkGraphSpec):
    *  - only `<a>` tags with an `href` attribute emit (a bare `<a name=…>`
    *    is a named target, not a link); the FIRST href attribute wins;
    *  - attribute names are case-insensitive; values may be double-quoted,
    *    single-quoted, or unquoted (to whitespace or '>');
    *  - a new `<a>` implicitly closes an open one (the HTML5 rule — nested
    *    anchors are invalid markup), `</a>` closes, EOF closes;
    *  - block tags do NOT close an anchor (segmentation is [[blocks]]'s
    *    job; an anchor spanning a `<br>` keeps accumulating text);
    *  - text outside an open anchor is ignored, inline tags inside one are
    *    invisible, raw-text content never contributes. */
  def anchors(html: String): Vector[Anchor] = {
    val out = Vector.newBuilder[Anchor]
    val lower = html.toLowerCase
    val n = html.length
    var open = false
    var curHref: String = null
    val sb = new java.lang.StringBuilder
    var pendingSpace = false

    def appendChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) { if (sb.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
    }

    def emit(): Unit = {
      if (open && curHref != null) out += Anchor(curHref, sb.toString)
      open = false; curHref = null; sb.setLength(0); pendingSpace = false
    }

    // entity decoding shared with blocks(): same named/decimal/hex table,
    // unknown or unterminated entities stay a literal '&'
    def entity(amp: Int): Int = {
      val semi = html.indexOf(';', amp + 1)
      if (semi < 0 || semi - amp > 12) { if (open) appendChar('&'); return amp + 1 }
      val body = html.substring(amp + 1, semi)
      val decoded: Option[String] =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
          catch { case _: Exception => None }
        else if (body.startsWith("#"))
          try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
          catch { case _: Exception => None }
        else Entities.get(body)
      decoded match {
        case Some(s) => if (open) s.foreach(appendChar); semi + 1
        case None    => if (open) appendChar('&'); amp + 1
      }
    }

    /** Scan a tag from `lt`, extracting the first href attribute value;
      * returns (index just past '>', name, closing, selfClosed, href|null). */
    def scanTag(lt: Int): (Int, String, Boolean, Boolean, String) = {
      var i = lt + 1
      val closing = i < n && html.charAt(i) == '/'
      if (closing) i += 1
      val nameStart = i
      while (i < n && html.charAt(i).isLetterOrDigit) i += 1
      val name = html.substring(nameStart, i).toLowerCase
      var href: String = null
      while (i < n && html.charAt(i) != '>') {
        val c = html.charAt(i)
        if (Character.isWhitespace(c) || c == '/') i += 1
        else {
          val as = i
          while (i < n && { val ch = html.charAt(i)
            ch != '=' && ch != '>' && ch != '/' && !Character.isWhitespace(ch) }) i += 1
          val aname = html.substring(as, i).toLowerCase
          while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
          var avalue: String = null
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && Character.isWhitespace(html.charAt(i))) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i); i += 1
              val vs = i
              while (i < n && html.charAt(i) != q) i += 1
              avalue = html.substring(vs, i)
              if (i < n) i += 1
            } else {
              val vs = i
              while (i < n && { val ch = html.charAt(i)
                ch != '>' && !Character.isWhitespace(ch) }) i += 1
              avalue = html.substring(vs, i)
            }
          }
          if (aname == "href" && href == null && avalue != null) href = avalue
        }
      }
      var selfClosed = false
      if (i > lt + 1 && i <= n) {
        var j = i - 1
        while (j > lt && Character.isWhitespace(html.charAt(j))) j -= 1
        selfClosed = html.charAt(j) == '/'
      }
      (if (i < n) i + 1 else n, name, closing, selfClosed, href)
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n &&
          (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?' ||
           html.charAt(i + 1) == '/' || html.charAt(i + 1).isLetter)) {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?') {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else {
          val (next, name, closing, selfClosed, href) = scanTag(i)
          i = next
          if (name.isEmpty) { /* "</>" or "< >": ignore */ }
          else if (!closing && !selfClosed && RawTextTags(name)) {
            val close = lower.indexOf("</" + name, i)
            if (close < 0) i = n
            else {
              val gt = html.indexOf('>', close)
              i = if (gt < 0) n else gt + 1
            }
          } else if (name == "a") {
            if (closing) emit()
            else {
              if (open) emit() // implicit close: nested <a> is invalid HTML
              if (!selfClosed) { open = true; curHref = href }
              else if (href != null) out += Anchor(href, "") // <a href=… />
            }
          }
          // all other tags: inline/invisible for the anchor pass
        }
      } else if (c == '&') {
        i = entity(i)
      } else {
        if (open) appendChar(c)
        i += 1
      }
    }
    emit()
    out.result()
  }

  /** Stage-2 classifier (integer thresholds; see class doc). */
  def isMain(b: Block, minChars: Int, maxLinkPct: Int, minStopPct: Int): Boolean = {
    if (b.nChars < minChars) return false
    if (100L * b.linkChars > maxLinkPct.toLong * b.nChars) return false
    val toks = b.text.toLowerCase.split(' ')
    val stops = toks.count(Stopwords.contains)
    100L * stops >= minStopPct.toLong * toks.length
  }

  /** Main-content extraction: good blocks joined with '\n'. */
  def mainText(html: String, minChars: Int = 25, maxLinkPct: Int = 33,
      minStopPct: Int = 8): String =
    blocks(html).filter(isMain(_, minChars, maxLinkPct, minStopPct))
      .map(_.text).mkString("\n")
}
