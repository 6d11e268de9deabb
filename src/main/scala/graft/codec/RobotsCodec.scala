package graft.codec

import java.util.Locale

/**
 * X76: robots.txt exclusion (RFC 9309) — the crawl-politeness gate every
 * production corpus pipeline applies before (or retroactively to) its URL
 * frontier: FineWeb-class curation re-filters crawls against the origin's
 * robots rules, and training-data opt-out compliance is exactly this
 * evaluation run at corpus scale. Pure JVM parser + matcher, implemented
 * from the public RFC:
 *
 *  - lines are `field: value`, field names case-insensitive, `#` starts a
 *    comment, blank/unknown lines are skipped (RFC 9309 §2.2);
 *  - a GROUP is one or more consecutive `User-agent` lines followed by its
 *    `Allow`/`Disallow` rules; a `User-agent` line after rules starts a new
 *    group; rules before any `User-agent` line belong to no group and are
 *    dropped;
 *  - group selection (§2.2.1): all groups whose user-agent value equals the
 *    crawler's product token (case-insensitive) merge; if none match, the
 *    `*` groups apply; if neither exists, everything is allowed;
 *  - an EMPTY Disallow/Allow value matches nothing (the classic
 *    "Disallow:" = allow-all idiom);
 *  - path patterns (§2.2.2): matched against the URI path from the first
 *    `/`; `*` matches any character sequence, `$` at the END of the
 *    pattern anchors the match to the end of the path (elsewhere it is a
 *    literal);
 *  - precedence (§2.2.2): the rule with the LONGEST pattern (octets) wins;
 *    on a tie, Allow wins; no matching rule = allowed.
 *
 * The matcher compiles each pattern to an anchored regex via
 * [[patternRegex]]; the SAME string is shipped into the DuckDB oracle
 * (RE2 and java.util.regex agree on this escaped subset), so engine and
 * oracle evaluate identical automata — the BpeSeedMerges no-drift
 * discipline applied to rule matching.
 */
object RobotsCodec {

  /** One merged-group rule, in file order. `pattern` is the raw path
    * pattern as written (its length is the precedence key). */
  final case class RobotsRule(pattern: String, allow: Boolean)

  /** One parsed group: its user-agent values (lowercased), its rules, and
    * any `Crawl-delay` values (whole seconds; malformed values dropped at
    * parse time). */
  final case class RobotsGroup(agents: Vector[String],
      rules: Vector[RobotsRule], delays: Vector[Long])

  /** The groups the given product token must obey (specific groups if any
    * match, else the `*` groups, else empty = allow-all). */
  private def groupsFor(content: String, agent: String): Vector[RobotsGroup] = {
    val token = agent.toLowerCase(Locale.ROOT)
    val groups = Vector.newBuilder[RobotsGroup]
    var agents = Vector.empty[String]
    var rules = Vector.empty[RobotsRule]
    var delays = Vector.empty[Long]
    var inAgents = false // true while consecutive user-agent lines accumulate
    var seenGroup = false
    def flush(): Unit = {
      if (seenGroup) groups += RobotsGroup(agents, rules, delays)
      agents = Vector.empty; rules = Vector.empty; delays = Vector.empty
    }
    content.split("\r?\n", -1).foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val line = noComment.trim
      val cut = line.indexOf(':')
      if (cut > 0) {
        val field = line.substring(0, cut).trim.toLowerCase(Locale.ROOT)
        val value = line.substring(cut + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) { flush(); inAgents = true; seenGroup = true }
            agents :+= value.toLowerCase(Locale.ROOT)
          case "allow" | "disallow" if seenGroup =>
            inAgents = false
            // empty pattern matches nothing (RFC: "Disallow:" allows all)
            if (value.nonEmpty)
              rules :+= RobotsRule(value, allow = field == "allow")
          case "crawl-delay" if seenGroup =>
            // de-facto extension (not in RFC 9309): whole seconds only;
            // malformed values are ignored like any unknown line. The value
            // is RECORDED but the line otherwise behaves like any unknown
            // field — it does NOT end a run of consecutive User-agent lines
            // (RFC 9309 §2.2.2: unrecognized lines don't break the group),
            // so 'User-agent: a / Crawl-delay: 1 / User-agent: b' keeps a
            // and b in ONE merged group, exactly as a parser that ignored
            // the field entirely would group them.
            if (value.matches("[0-9]{1,9}")) delays :+= value.toLong
          case _ => // unknown field (sitemap, ...) — ignored
        }
      }
    }
    flush()
    val all = groups.result()
    val specific = all.filter(_.agents.contains(token))
    if (specific.nonEmpty) specific else all.filter(_.agents.contains("*"))
  }

  /** Parse `content` and return the merged rule list the given product
    * token must obey. */
  def rulesFor(content: String, agent: String): Vector[RobotsRule] =
    groupsFor(content, agent).flatMap(_.rules)

  /** The `Crawl-delay` (whole seconds) the given product token must obey:
    * the MAXIMUM valid value across its merged selected groups — when
    * grouping merges runs the way a delay-unaware RFC 9309 parser would
    * (consecutive User-agent lines share one group), a token can see
    * several recorded delays whose original adjacency is lost; taking the
    * most conservative one can only over-delay, never under-delay a host
    * that a delay-scoping parser (Bing/Yandex) would protect. A delay in a
    * group the token doesn't select is ignored. None = the file states no
    * delay (callers apply their politeness default). */
  def crawlDelayFor(content: String, agent: String): Option[Long] =
    groupsFor(content, agent).flatMap(_.delays).reduceOption(_ max _)

  /** All `Sitemap:` directive values in file order. The sitemap extension
    * (the sitemaps.org protocol's robots.txt hook) is GROUP-INDEPENDENT:
    * the directive may appear anywhere in the file and applies regardless
    * of user-agent, so harvesting ignores group structure entirely — this
    * is the crawler's sitemap DISCOVERY input (robots.txt is the one URL
    * per origin a crawler always fetches; everything else is found). */
  def sitemapsFor(content: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    content.split("\r?\n", -1).foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val line = noComment.trim
      val cut = line.indexOf(':')
      if (cut > 0 &&
          line.substring(0, cut).trim.toLowerCase(Locale.ROOT) == "sitemap") {
        val v = line.substring(cut + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result()
  }

  /** Compile a path pattern to the anchored regex both the engine and the
    * DuckDB oracle evaluate: `^` + literal chars with regex metachars
    * escaped, `*` → `.*`, a trailing `$` → the end anchor (a non-trailing
    * `$` is a literal). No trailing anchor = prefix match (the regex
    * engines' substring search + the `^` anchor give exactly that). */
  def patternRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    val n = pattern.length
    while (i < n) {
      pattern.charAt(i) match {
        case '*' => sb.append(".*")
        case '$' if i == n - 1 => sb.append('$')
        case c if "\\.^$|?*+()[]{}".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Reference decision (the spec's local model; the engine evaluates the
    * same logic relationally): longest matching pattern wins, Allow wins
    * ties, no match = allowed. */
  def isAllowed(rules: Seq[RobotsRule], path: String): Boolean = {
    // find(), not matches(): rlike and regexp_matches are substring-search
    // semantics (the ^ anchor makes it a prefix match) — the spec's local
    // model must run the SAME semantics
    val hits = rules.filter(r =>
      java.util.regex.Pattern.compile(patternRegex(r.pattern)).matcher(path).find())
    if (hits.isEmpty) true
    else {
      val best = hits.maxBy(r => (r.pattern.length, r.allow))
      best.allow
    }
  }
}
