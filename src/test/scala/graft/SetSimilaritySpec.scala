package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/**
 * X56 prefix-filtering set-similarity join (PPJoin family), X57 containment
 * pairs, X58 graded contamination score. The prefix filter's recall is a
 * theorem (a qualifying pair that avoided one side's prefix would need its
 * whole intersection inside a suffix shorter than the intersection), the
 * exact verify is precision — so ppjoinPairs must EQUAL brute-force
 * all-pairs on any corpus; same exact-blocking argument for containment.
 */
class SetSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def tokset(s: String): Set[String] = grams(s, 3)

  private def bruteJaccard(rows: Seq[(Long, String)], t: Double): Set[(Long, Long)] =
    (for {
      (ia, ta) <- rows; (ib, tb) <- rows
      if ia < ib
      a = tokset(ta); b = tokset(tb)
      if a.nonEmpty && b.nonEmpty &&
        a.intersect(b).size.toDouble / a.union(b).size >= t
    } yield (ia, ib)).toSet

  // deterministic pseudo-text: doc i draws tokens from a small shared pool
  // so natural mid-similarity pairs exist, plus exact planted twins
  private def corpus(n: Int): Seq[(Long, String)] = {
    val pool = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0 until n).map { i =>
      val toks = (0 until 6 + i % 5).map(j => pool((i * 7 + j * 3) % pool.size))
      (i.toLong, toks.mkString(" "))
    }
    val twins = base.filter(_._1 % 4 == 0).map { case (id, t) =>
      (id + 1000L, t + " extratok")
    }
    base ++ twins
  }

  test("ppjoinPairs equals brute-force all-pairs Jaccard") {
    val rows = corpus(60)
    val got = Dedup.ppjoinPairs(rows.toDF("doc_id", "text"), threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = bruteJaccard(rows, 0.6)
    assert(got == want,
      s"extra=${got -- want} missing=${want -- got} (want ${want.size})")
    assert(want.nonEmpty)
  }

  test("ppjoinPairs reported jaccard values are exact") {
    val rows = corpus(40)
    val got = Dedup.ppjoinPairs(rows.toDF("doc_id", "text"), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val byId = rows.toMap
    got.foreach { case ((ia, ib), j) =>
      val a = tokset(byId(ia)); val b = tokset(byId(ib))
      val exact = a.intersect(b).size.toDouble / a.union(b).size
      assert(math.abs(j - BigDecimal(exact).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"pair ($ia,$ib)")
    }
  }

  test("prefix flood cap drops flooded candidates wholesale; None restores exact recall") {
    // every doc is the SAME five tokens → every trigram is a prefix element
    // of every doc and each bucket holds all 300 docs
    val flood = (0 until 300).map(i => (i.toLong, "hot cold warm cool mild"))
    val capped = Dedup.ppjoinPairs(flood.toDF("doc_id", "text"),
      threshold = 0.6, maxDocsPerPrefixToken = Some(50))
    assert(capped.count() == 0L)
    val exact = Dedup.ppjoinPairs(flood.take(20).toDF("doc_id", "text"),
      threshold = 0.6, maxDocsPerPrefixToken = None)
    assert(exact.count() == 20L * 19 / 2)
  }

  test("ppjoin candidate join is an equi-join — never a cartesian") {
    val rows = corpus(30)
    val plan = Dedup.ppjoinPairs(rows.toDF("doc_id", "text"), threshold = 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"non-equi join leaked into the pair plan:\n$plan")
  }

  private def grams(s: String, n: Int): Set[String] = {
    val toks = s.toLowerCase.trim.split("\\s+", -1)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("containmentPairs equals brute force and catches the low-Jaccard embedded doc") {
    val long = (0 until 60).map(j => s"tok$j").mkString(" ")
    val short = (0 until 10).map(j => s"tok$j").mkString(" ")  // ⊂ long
    val noise = (0 until 25).map(i =>
      (100L + i, (0 until 12).map(j => s"n${i}_$j").mkString(" ")))
    val rows = Seq((1L, long), (2L, short)) ++ noise
    val got = Dedup.containmentPairs(rows.toDF("doc_id", "text"), n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // brute truth
    val want = (for {
      (ia, ta) <- rows; (ib, tb) <- rows
      if ia < ib
      a = grams(ta, 3); b = grams(tb, 3)
      if a.nonEmpty && b.nonEmpty
      inter = a.intersect(b).size
      if inter.toDouble / math.min(a.size, b.size) >= 0.9
    } yield if (a.size <= b.size) (ia, ib) else (ib, ia)).toSet
    assert(got.map(r => (r._1, r._2)).toSet == want)
    // the embedded pair: containment 1.0, Jaccard well under the 0.9 bar
    val hit = got.find(r => r._1 == 2L && r._2 == 1L).get
    assert(hit._3 == 1.0, s"containment ${hit._3}")
    assert(hit._4 < 0.2, s"jaccard ${hit._4} should be low — that's the point")
  }

  test("containmentPairs orders the smaller gram set first, ties by id") {
    val rows = Seq((7L, "a b c d e"), (3L, "a b c d e")) // identical sets
    val r = Dedup.containmentPairs(rows.toDF("doc_id", "text"), n = 3, threshold = 0.9)
      .collect()
    assert(r.length == 1 && r(0).getLong(0) == 3L && r(0).getLong(1) == 7L)
  }

  test("contaminationScore matches the hand model, zero-overlap docs included") {
    val eval = Seq((1000L, "w x y z")).toDF("doc_id", "text") // grams: "w x y","x y z"
    val train = Seq(
      (1L, "w x y z q"),   // grams: wxy,xyz,yzq → shared 2/3
      (2L, "a b c d"),     // shared 0/2
      (3L, "w x y"))       // shared 1/1 → contaminated
      .toDF("doc_id", "text")
    val got = Dedup.contaminationScore(train, eval, n = 3, flagAt = 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((3L, 2L, 0.666667, true)))
    assert(got(2L) == ((2L, 0L, 0.0, false)))
    assert(got(3L) == ((1L, 1L, 1.0, true)))
  }

  test("contaminationScore broadcasts the eval grams — the corpus never shuffles against them") {
    val eval = Seq((1000L, "w x y z")).toDF("doc_id", "text")
    val train = (0 until 50).map(i => (i.toLong, s"w x y z doc $i body")).toDF("doc_id", "text")
    val plan = Dedup.contaminationScore(train, eval).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"eval side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled against eval grams:\n$plan")
  }
}
