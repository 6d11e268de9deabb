package graft

import org.apache.spark.sql.functions._

import graft.codec.HtmlCodec
import graft.plans.SketchFunctions

/**
 * X80–X83 web-graph family: the anchor-harvest parser's edge cases
 * (quoting, attribute order/case, href selection, nesting, entities,
 * raw-text/comment skip), expression-vs-codec agreement, a brute-force
 * Scala PageRank reference for the integer-grid iteration, and the plan
 * shapes the 100 TB story depends on (rank plane broadcasts, corpus
 * touched once). The SQL oracles (d_link_extract / d_pagerank /
 * d_anchor_topk / d_authority_curate) cover the planted end-to-end paths;
 * this spec owns the semantics.
 */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def hrefs(html: String): Seq[(String, String)] =
    HtmlCodec.anchors(html).map(a => (a.href, a.text))

  test("anchors: quoting styles, attribute order and case") {
    assert(hrefs("""<a href="/a">x</a>""") == Seq(("/a", "x")))
    assert(hrefs("<a href='/b'>y</a>") == Seq(("/b", "y")))
    assert(hrefs("<a href=/c>z</a>") == Seq(("/c", "z")))
    // attribute order irrelevant, names case-insensitive, tag case too
    assert(hrefs("""<A CLASS="big" HREF="/d" id=q>t</A>""") == Seq(("/d", "t")))
    // first href wins when duplicated
    assert(hrefs("""<a href="/one" href="/two">t</a>""") == Seq(("/one", "t")))
    // '>' inside a quoted attribute value does not close the tag
    assert(hrefs("""<a title="a>b" href="/e">t</a>""") == Seq(("/e", "t")))
  }

  test("anchors: href-less <a> is a named target, not a link") {
    assert(hrefs("""<a name="top">not a link</a> <a href="/f">g</a>""") ==
      Seq(("/f", "g")))
    // a bare valueless href attribute doesn't count either
    assert(hrefs("""<a href>t</a>""") == Seq.empty)
  }

  test("anchors: nesting implicitly closes, EOF closes, self-closed emits empty text") {
    // HTML5: a new <a> closes the open one
    assert(hrefs("""<a href="/p">out<a href="/q">in</a>""") ==
      Seq(("/p", "out"), ("/q", "in")))
    // unterminated anchor emits at EOF
    assert(hrefs("""<a href="/r">tail text""") == Seq(("/r", "tail text")))
    assert(hrefs("""<a href="/s"/> after""") == Seq(("/s", "")))
  }

  test("anchors: text is entity-decoded + collapsed; href stays raw") {
    assert(hrefs("""<a href="/x?a=1&amp;b=2">Q &amp; A</a>""") ==
      Seq(("/x?a=1&amp;b=2", "Q & A")))
    assert(hrefs("<a href=\"/y\">  lots \t of\n  space  </a>") ==
      Seq(("/y", "lots of space")))
    // inline tags inside an anchor are invisible; block tags don't close it
    assert(hrefs("""<a href="/z">an<b>cho</b>r<br> text</a>""") ==
      Seq(("/z", "anchor text")))
  }

  test("anchors: raw-text sections, comments and outside text are skipped") {
    val html = """<script>var s = '<a href="/fake">no</a>';</script>
      <!-- <a href="/ghost">no</a> -->
      plain text <a href="/real">yes</a> trailing"""
    assert(hrefs(html) == Seq(("/real", "yes")))
  }

  test("html_links expression (codegen) agrees with the codec; null passes through") {
    val rows = Seq(
      """<p><a href="http://h.org/1">one</a><a href='/rel'>two</a></p>""",
      "<p>no links at all</p>",
      null)
    val got = rows.toDF("h")
      .select(SketchFunctions.html_links(col("h")).as("l"))
      .select(expr("transform(l, a -> concat(a.href, '|', a.text))").as("f"))
      .collect()
      .map(r => Option(r.getSeq[String](0)).map(_.toList))
    val want = rows.map(Option(_).map(h =>
      HtmlCodec.anchors(h).map(a => s"${a.href}|${a.text}").toList))
    assert(got.toSeq == want)
  }

  test("d_pagerank matches a brute-force Scala reference on the closed-form graph") {
    val dir = "/root/testdata/sf0.001"
    val n = 500
    // the planted graph, closed-form (the oracle's lnk/edges CTEs in Scala)
    val edges = (0 until n).flatMap { i =>
      (0 to i % 3).map { j =>
        (s"site${i % 101}.org", s"site${(i * 7 + 13 * j + 1) % 101}.org")
      }
    }.filter { case (s, d) => s != d }
      .groupBy(identity).map { case ((s, d), g) => (s, d, g.size.toLong) }.toSeq
    val outw = edges.groupBy(_._1).map { case (s, es) => (s, es.map(_._3).sum) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => pr(src) * w / outw(src) }.sum
      }
      pr = nodes.map(d => d -> (150000L + 85L * contrib.getOrElse(d, 0L) / 100L)).toMap
    }
    val got = SparkEntry.queries("d_pagerank")(spark, dir)
      .select("domain", "pr").as[(String, Long)].collect().toMap
    assert(got == pr)
    // the grid conserves mass up to floor losses: total stays within
    // |nodes| rounding units of N·S
    val total = pr.values.sum
    assert(total <= 101L * 1000000L && total > 101L * 1000000L - 2L * 101L * 100L,
      s"mass drifted: $total")
  }

  test("d_trustrank matches a brute-force seeded reference") {
    val dir = "/root/testdata/sf0.001"
    val n = 500
    val edges = (0 until n).flatMap { i =>
      (0 to i % 3).map { j =>
        (s"site${i % 101}.org", s"site${(i * 7 + 13 * j + 1) % 101}.org")
      }
    }.filter { case (s, d) => s != d }
      .groupBy(identity).map { case ((s, d), g) => (s, d, g.size.toLong) }.toSeq
    val outw = edges.groupBy(_._1).map { case (s, es) => (s, es.map(_._3).sum) }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    def trusted(d: String): Boolean =
      d.stripPrefix("site").stripSuffix(".org").toLong % 10 == 0
    var tr = nodes.map(d => d -> (if (trusted(d)) 1000000L else 0L)).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => tr(src) * w / outw(src) }.sum
      }
      tr = nodes.map(d => d -> ((if (trusted(d)) 150000L else 0L) +
        85L * contrib.getOrElse(d, 0L) / 100L)).toMap
    }
    val got = SparkEntry.queries("d_trustrank")(spark, dir)
      .select("domain", "tr").as[(String, Long)].collect().toMap
    assert(got == tr)
    // every seed keeps at least its own teleport mass; trust never exceeds
    // the vanilla-PageRank grid ceiling on this graph
    nodes.filter(trusted).foreach(d => assert(got(d) >= 150000L, s"seed $d lost its teleport"))
  }

  test("d_hits matches a brute-force reference with integer renormalization") {
    val dir = "/root/testdata/sf0.001"
    val n = 500
    val edges = (0 until n).flatMap { i =>
      (0 to i % 3).map { j =>
        (s"site${i % 101}.org", s"site${(i * 7 + 13 * j + 1) % 101}.org")
      }
    }.filter { case (s, d) => s != d }
      .groupBy(identity).map { case ((s, d), g) => (s, d, g.size.toLong) }.toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    def norm(m: Map[String, Long]): Map[String, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => k -> v * 1000000L / mx }
    }
    var auth = nodes.map(_ -> 1000000L).toMap
    var hub = Map.empty[String, Long]
    for (_ <- 1 to 3) {
      val h = edges.groupBy(_._1).map { case (src, es) =>
        src -> es.map { case (_, dst, w) => w * auth(dst) }.sum
      }
      hub = norm(nodes.map(d => d -> h.getOrElse(d, 0L)).toMap)
      val a = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => w * hub(src) }.sum
      }
      auth = norm(nodes.map(d => d -> a.getOrElse(d, 0L)).toMap)
    }
    val got = SparkEntry.queries("d_hits")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == nodes.size)
    nodes.foreach { d =>
      assert(got(d) == ((hub(d), auth(d))), s"mismatch at $d")
    }
    // renormalization pins each plane's max to exactly the grid unit
    assert(got.values.map(_._1).max == 1000000L)
    assert(got.values.map(_._2).max == 1000000L)
  }

  test("d_mutual_links matches a brute-force reciprocal-weight reference") {
    val dir = "/root/testdata/sf0.001"
    val n = 500
    val edges = (0 until n).flatMap { i =>
      (0 to i % 3).map { j =>
        (s"site${i % 101}.org", s"site${(i * 7 + 13 * j + 1) % 101}.org")
      }
    }.filter { case (s, d) => s != d }
      .groupBy(identity).map { case ((s, d), g) => ((s, d), g.size.toLong) }
    val nodes = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSeq.distinct
    val outw = edges.groupBy(_._1._1).map { case (s, es) => (s, es.values.sum) }
    val recip = nodes.map { u =>
      u -> edges.collect {
        case ((s, d), w) if s == u && edges.contains((d, s)) =>
          math.min(w, edges((d, s)))
      }.sum
    }.toMap
    val got = SparkEntry.queries("d_mutual_links")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.size == nodes.size)
    nodes.foreach { u =>
      val ow = outw.getOrElse(u, 0L)
      val rw = recip.getOrElse(u, 0L)
      val nep = if (ow == 0) 0L else rw * 1000000L / ow
      assert(got(u) == ((ow, rw, nep)), s"mismatch at $u")
    }
  }

  test("d_harmonic_centrality matches a brute-force BFS reference") {
    val dir = "/root/testdata/sf0.001"
    val n = 500
    val edges = (0 until n).flatMap { i =>
      (0 to i % 3).map { j =>
        (s"site${i % 101}.org", s"site${(i * 7 + 13 * j + 1) % 101}.org")
      }
    }.filter { case (s, d) => s != d }.distinct
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    // shortest directed distance u→v up to 3 via BFS from every u
    val want = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for (u <- nodes) {
      var frontier = out.getOrElse(u, Set.empty) - u
      val dist = scala.collection.mutable.Map.empty[String, Int]
      frontier.foreach(v => dist(v) = 1)
      for (d <- 2 to 3) {
        frontier = frontier.flatMap(m => out.getOrElse(m, Set.empty))
          .filter(v => v != u && !dist.contains(v))
        frontier.foreach(v => dist(v) = d)
      }
      dist.foreach { case (v, d) =>
        val (h, c) = want.getOrElse(v, (0L, 0L))
        want(v) = (h + 1000000L / d, c + 1)
      }
    }
    val got = SparkEntry.queries("d_harmonic_centrality")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == nodes.size)
    nodes.foreach { v =>
      assert(got(v) == want.getOrElse(v, (0L, 0L)), s"mismatch at $v")
    }
  }

  test("plan shapes: extraction is scan-side, rank plane broadcasts, corpus never re-shuffles") {
    val dir = "/root/testdata/sf0.001"
    val pr = SparkEntry.queries("d_pagerank")(spark, dir)
    pr.collect()
    val plan = pr.queryExecution.executedPlan.toString
    // every iteration joins the bounded rank plane by broadcast — a
    // SortMergeJoin here would mean the domain plane shuffles 5× per run
    assert(plan.contains("BroadcastHashJoin"), s"rank join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
    val ac = SparkEntry.queries("d_authority_curate")(spark, dir)
    ac.collect()
    val acPlan = ac.queryExecution.executedPlan.toString
    assert(acPlan.contains("BroadcastHashJoin"),
      s"authority keep-list not broadcast:\n$acPlan")
    // link extraction row: the parser is a pure scan projection — the only
    // exchange below the explode is none at all (posexplode is narrow)
    val le = SparkEntry.queries("d_link_extract")(spark, dir)
    le.collect()
    val lePlan = le.queryExecution.executedPlan.toString
    assert(!lePlan.contains("Exchange"), s"link extract shuffles:\n$lePlan")
  }

  test("fixture invariant: document text contains no '<' or '&'") {
    val bad = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").contains("<") || col("text").contains("&"))
      .count()
    assert(bad == 0L)
  }
}
