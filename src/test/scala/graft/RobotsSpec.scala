package graft

import org.apache.spark.sql.functions._

import graft.codec.RobotsCodec
import graft.codec.RobotsCodec.RobotsRule

/**
 * X76 robots.txt exclusion (RFC 9309): the parser must honor group
 * structure (specific product token beats `*`), field/agent
 * case-insensitivity, comments, and the empty-Disallow idiom; the matcher
 * must apply longest-match precedence with Allow winning ties and the
 * `*`/`$` pattern specials; and the engine's relational evaluation must
 * agree row-for-row with the local reference model on the real fixture.
 */
class RobotsSpec extends SparkSpec {

  private val exampleCom =
    """# comment line
      |User-Agent: GraftBot
      |Disallow: /private/
      |Allow: /private/pub/
      |Disallow: /*.pdf$
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("group selection: the specific product token's group wins over *") {
    val rules = RobotsCodec.rulesFor(exampleCom, "graftbot")
    assert(rules == Vector(
      RobotsRule("/private/", allow = false),
      RobotsRule("/private/pub/", allow = true),
      RobotsRule("/*.pdf$", allow = false)))
    // an agent with no specific group falls back to the * group
    assert(RobotsCodec.rulesFor(exampleCom, "otherbot") ==
      Vector(RobotsRule("/", allow = false)))
  }

  test("field names and agent tokens match case-insensitively; comments strip") {
    val txt = "# lead\nUSER-AGENT: GRAFTBOT # trailing comment\nDISALLOW: /x/\nALLOW: /x/y/\n"
    assert(RobotsCodec.rulesFor(txt, "GraftBot") == Vector(
      RobotsRule("/x/", allow = false), RobotsRule("/x/y/", allow = true)))
  }

  test("empty Disallow matches nothing (allow-all idiom); rules before any group drop") {
    assert(RobotsCodec.rulesFor("User-agent: graftbot\nDisallow:\n", "graftbot").isEmpty)
    // a rule with no preceding user-agent line belongs to no group
    assert(RobotsCodec.rulesFor("Disallow: /\nUser-agent: *\nAllow: /a\n", "graftbot") ==
      Vector(RobotsRule("/a", allow = true)))
  }

  test("multi-agent groups share rules; a later user-agent starts a new group") {
    val txt = "User-agent: a\nUser-agent: graftbot\nDisallow: /one\n" +
      "User-agent: b\nDisallow: /two\n"
    assert(RobotsCodec.rulesFor(txt, "graftbot") ==
      Vector(RobotsRule("/one", allow = false)))
    assert(RobotsCodec.rulesFor(txt, "b") == Vector(RobotsRule("/two", allow = false)))
    // no specific group and no * group → empty → everything allowed
    assert(RobotsCodec.rulesFor(txt, "c").isEmpty)
  }

  test("patternRegex: anchored prefix, * wildcard, trailing $ anchor, metachars escaped") {
    assert(RobotsCodec.patternRegex("/doc/") == "^/doc/")
    assert(RobotsCodec.patternRegex("/*.pdf$") == "^/.*\\.pdf$")
    // a $ that is NOT at the end is a literal
    assert(RobotsCodec.patternRegex("/a$b") == "^/a\\$b")
    assert(RobotsCodec.patternRegex("/p(1)+x") == "^/p\\(1\\)\\+x")
  }

  test("decision: longest match wins, Allow wins ties, no match allows") {
    val rules = Vector(
      RobotsRule("/private/", allow = false),
      RobotsRule("/private/pub/", allow = true),
      RobotsRule("/*.pdf$", allow = false))
    assert(!RobotsCodec.isAllowed(rules, "/private/7"))
    assert(RobotsCodec.isAllowed(rules, "/private/pub/4")) // longer Allow wins
    assert(!RobotsCodec.isAllowed(rules, "/files/9.pdf"))  // wildcard + $ anchor
    assert(RobotsCodec.isAllowed(rules, "/files/9.pdfx"))  // $ anchors the end
    assert(RobotsCodec.isAllowed(rules, "/doc/1"))         // no match
    val tie = Vector(RobotsRule("/doc/", allow = false), RobotsRule("/doc/", allow = true))
    assert(RobotsCodec.isAllowed(tie, "/doc/3"))           // same length → Allow
  }

  test("engine decision agrees with the local model on every sf0.001 row, broadcast plan") {
    val df = SparkEntry.queries("d_robots_filter")(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the rules plane must broadcast")
    // local model: the same seed texts RobotsCodec-parsed, the same closed
    // form for host/path, decided by the reference isAllowed
    val rulesByDomain: Map[String, Vector[RobotsRule]] =
      (Seq("example.com" -> exampleCom,
        "example.co.uk" -> ("User-agent: otherbot\nDisallow: /\n\n" +
          "User-agent: *\nDisallow: /doc/\nAllow: /doc/\nDisallow: /files/\n")) ++
        (0 to 6).map(k => s"site$k.org" ->
          (if (k % 2 == 0) "User-agent: graftbot\nDisallow:\n"
           else "User-agent: *\nDisallow: /\n")))
        .map { case (d, t) => d -> RobotsCodec.rulesFor(t, "graftbot") }.toMap
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val domain = r.getString(1)
      val expectedDomain = (id % 4) match {
        case 0 | 3 => "example.com"
        case 1     => "example.co.uk"
        case 2     => s"site${id % 7}.org"
      }
      assert(domain == expectedDomain, s"doc $id domain")
      val path = (id % 3) match {
        case 0 => s"/doc/$id"
        case 1 => if (id % 2 == 0) s"/private/pub/$id" else s"/private/$id"
        case 2 => s"/files/$id.pdf"
      }
      assert(r.getBoolean(2) == RobotsCodec.isAllowed(rulesByDomain(domain), path),
        s"doc $id ($domain$path)")
    }
    // the fixture exercises both outcomes
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)))
  }

  test("property: patternRegex agrees with a direct wildcard matcher on random pairs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
    // independent reference: RFC 9309 wildcard matching by recursion —
    // pattern matches a PREFIX of path; '*' spans any run; trailing '$'
    // anchors the end; no regex machinery involved
    def wildMatch(pat: String, path: String): Boolean = {
      def go(pi: Int, si: Int): Boolean =
        if (pi == pat.length) true
        else if (pat.charAt(pi) == '$' && pi == pat.length - 1) si == path.length
        else if (pat.charAt(pi) == '*')
          (si to path.length).exists(s2 => go(pi + 1, s2))
        else si < path.length && path.charAt(si) == pat.charAt(pi) && go(pi + 1, si + 1)
      go(0, 0)
    }
    val segGen = Gen.listOf(Gen.frequency(
      8 -> Gen.oneOf('a', 'b', '/', '.'),
      1 -> Gen.const('*'),
      1 -> Gen.const('$'))).map(_.mkString)
    val pathGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', '/', '.')).map("/" + _.mkString)
    sample(Gen.zip(segGen.map("/" + _), pathGen), 400, 4242L).foreach {
      case (pat, path) =>
        val rx = java.util.regex.Pattern.compile(RobotsCodec.patternRegex(pat))
        assert(rx.matcher(path).find() == wildMatch(pat, path),
          s"pattern '$pat' vs path '$path'")
    }
  }

  test("frontier curation fetches exactly the index-filtered, robots-allowed set") {
    val df = SparkEntry.queries("d_frontier_curate")(spark, "/root/testdata/sf0.001")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val fetched = df.collect().map(_.getLong(0)).toSet
    assert(fetched.nonEmpty)
    fetched.foreach { id =>
      assert(id % 13 != 0 && id % 11 != 0, s"doc $id fails the index filter")
      // odd .org sites are robots-blocked; everything else on /doc/ is allowed
      assert(!(id % 4 == 2 && (id % 7) % 2 == 1), s"doc $id is robots-blocked")
    }
    // blocked domains are genuinely absent (k odd), allowed ones present
    val domains = df.collect().map(_.getString(1)).toSet
    assert(domains.exists(_.startsWith("site")) &&
      !domains.exists(d => Set("site1.org", "site3.org", "site5.org")(d)))
  }

  test("crawlDelayFor: selected group wins, invalid values skip, decoys ignore") {
    val txt =
      """User-agent: otherbot
        |Crawl-delay: 99
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow: /x
        |Crawl-delay: fast
        |Crawl-delay: 3
        |Crawl-delay: 5
        |
        |User-agent: *
        |Crawl-delay: 7
        |""".stripMargin
    // max VALID value in the selected (specific) group; * group ignored
    assert(RobotsCodec.crawlDelayFor(txt, "GraftBot") == Some(5L))
    // no specific group → the * group's delay
    assert(RobotsCodec.crawlDelayFor(txt, "somebot") == Some(7L))
    // no delay stated anywhere for the selected groups
    assert(RobotsCodec.crawlDelayFor(
      "User-agent: graftbot\nDisallow:\n", "graftbot").isEmpty)
    // a crawl-delay line between consecutive User-agent lines does NOT end
    // the accumulation (it is an unknown field per RFC 9309 — recorded, but
    // grouping behaves as if the line were ignored): a and b share ONE
    // merged group carrying both delays, and each token gets the MAX —
    // most conservative, since the merge lost which delay sat next to
    // which agent line (a delay-scoping parser would give b 4 here; max
    // can over-delay but never under-delay)
    val split = "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nCrawl-delay: 4\n"
    assert(RobotsCodec.crawlDelayFor(split, "b") == Some(4L))
    assert(RobotsCodec.crawlDelayFor(split, "a") == Some(4L))
    // ...and b therefore INHERITS a rule stated after its User-agent line
    // under the shared group (the real-world shape the old splitting parser
    // silently broke)
    val shared = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /x\n"
    assert(!RobotsCodec.isAllowed(RobotsCodec.rulesFor(shared, "a"), "/x/y"))
    assert(!RobotsCodec.isAllowed(RobotsCodec.rulesFor(shared, "b"), "/x/y"))
  }

  test("sitemapsFor: group-independent harvest, comments and blanks ignored, order kept") {
    val txt = """# header comment
      |Sitemap: http://a.test/sm1.xml
      |User-agent: x
      |Disallow: /
      |Sitemap: http://a.test/sm2.xml # trailing comment
      |sitemap: http://a.test/sm3.xml
      |Sitemap:
      |User-agent: y
      |Sitemap: http://a.test/sm4.xml
      |""".stripMargin
    assert(RobotsCodec.sitemapsFor(txt) == Vector(
      "http://a.test/sm1.xml", "http://a.test/sm2.xml",
      "http://a.test/sm3.xml", "http://a.test/sm4.xml"))
    // harvesting never disturbs group parsing: x still blocks everything
    assert(!RobotsCodec.isAllowed(RobotsCodec.rulesFor(txt, "x"), "/p"))
    assert(RobotsCodec.sitemapsFor("User-agent: *\nDisallow: /\n").isEmpty)
  }

  test("d_robots_sitemap_frontier: only DECLARED sitemaps are read — block-all origins absent") {
    val rows = SparkEntry.queries("d_robots_sitemap_frontier")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0)).toSet
    // even sites + both example domains declare; odd block-all sites do not
    assert(rows == Set("example.com", "example.co.uk",
      "site0.org", "site2.org", "site4.org", "site6.org"), rows)
  }

  test("d_crawl_schedule: per-host FIFO spacing honors each origin's delay, one worker per host") {
    val rows = SparkEntry.queries("d_crawl_schedule")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // expected per-domain delays from the seed: example.com graftbot group
    // 3 s (invalid 'fast' skipped, * group's 9 ignored), example.co.uk *
    // group 2 s, site2/4/6 → 2/3/1 s, site0 absent → 1 s default
    val delayOf: String => Long = {
      case h if h.endsWith("example.com") => 3L
      case h if h.endsWith("example.co.uk") => 2L
      case "news.site2.org" => 2L
      case "news.site4.org" => 3L
      case "news.site6.org" => 1L
      case "news.site0.org" => 1L // no Crawl-delay stated → default
      case h => fail(s"unexpected host $h")
    }
    rows.groupBy(_._2).foreach { case (host, hs) =>
      val byId = hs.sortBy(_._1)
      // slots are 0..n-1 in doc_id order; fetch_at = slot · delay · 1000
      byId.zipWithIndex.foreach { case ((_, _, slot, at, _), i) =>
        assert(slot == i.toLong, s"$host slot gap at $i")
        assert(at == slot * delayOf(host) * 1000L, s"$host fetch_at mismatch")
      }
      assert(hs.map(_._5).distinct.length == 1, s"$host spans workers")
    }
    // robots-blocked hosts never appear: odd .org sites, and nothing from
    // a blocked path family survives on example.com (/private/ non-pub)
    val hosts = rows.map(_._2).toSet
    assert(!hosts.exists(h => Set("news.site1.org", "news.site3.org",
      "news.site5.org")(h)))
  }

  test("d_stream_crawl_schedule: slot counters continue across micro-batches = batch schedule") {
    val dir = "/root/testdata/sf0.001"
    def rows(name: String) = SparkEntry.queries(name)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val stream = rows("d_stream_crawl_schedule")
    val batch = rows("d_crawl_schedule")
    assert(stream.nonEmpty)
    // every host spans all four range batches (hosts hash by doc_id % 4/7),
    // so equality here proves the per-host counter genuinely CONTINUED
    // across micro-batches instead of restarting at 0
    assert(stream == batch)
  }
}
