package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/**
 * X55 maximal cross-document shared-run extraction: the operator must
 * equal the DEFINITION of a maximal shared run — a longest-common-
 * extension at (pos_a, pos_b) of length ≥ k that cannot extend left or
 * right — computed by an independent brute pass, and must fold a long
 * shared passage into exactly ONE row however many overlapping windows
 * witness it.
 */
class SharedRunPairsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute truth from the definition: all maximal common extensions ≥ k. */
  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Long, Long, Long)] = {
    val toks = rows.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)
    }.toMap
    (for {
      (a, ta) <- toks.toSeq; (b, tb) <- toks.toSeq if a < b
      pa <- ta.indices; pb <- tb.indices
      if ta(pa) == tb(pb)
      // maximal start: no identical token immediately left
      if pa == 0 || pb == 0 || ta(pa - 1) != tb(pb - 1)
      m = (0 until math.min(ta.length - pa, tb.length - pb))
        .takeWhile(i => ta(pa + i) == tb(pb + i)).size
      if m >= k
    } yield (a, b, pa.toLong, pb.toLong, m.toLong)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int,
      cap: Int = 64): Set[(Long, Long, Long, Long, Long)] =
    Dedup.sharedRunPairs(rows.toDF("doc_id", "text"), spanTokens = k,
        maxSitesPerDigest = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

  private val t10 = (0 until 10).map(i => s"w$i").mkString(" ") // 10 shared tokens

  test("equals the brute maximal-common-extension truth") {
    val rows = Seq(
      (1L, s"alpha beta $t10 gamma delta"),
      (2L, s"x y z $t10 q r"),
      (3L, s"one two three four five six seven eight nine ten eleven"),
      (4L, s"$t10"), // exactly the shared run, at position 0
      (5L, "unrelated text with no overlap at all here today"))
    assert(run(rows, k = 3) == brute(rows, k = 3))
    assert(run(rows, k = 5) == brute(rows, k = 5))
  }

  test("a long shared passage folds to ONE maximal row, not per-window rows") {
    val passage = (0 until 25).map(i => s"p$i").mkString(" ")
    val rows = Seq(
      (1L, s"head1 head2 $passage tail1"),
      (2L, s"$passage other words entirely"))
    val got = run(rows, k = 10)
    assert(got == Set((1L, 2L, 2L, 0L, 25L)), s"got $got")
  }

  test("two runs at the same alignment offset separated by a gap stay distinct rows") {
    val r1 = (0 until 12).map(i => s"a$i").mkString(" ")
    val r2 = (0 until 12).map(i => s"b$i").mkString(" ")
    val rows = Seq(
      (1L, s"$r1 gapx $r2"),
      (2L, s"$r1 gapy $r2")) // same offsets, mismatching middle token
    val got = run(rows, k = 10)
    assert(got == Set((1L, 2L, 0L, 0L, 12L), (1L, 2L, 13L, 13L, 12L)), s"got $got")
  }

  test("hot windows above the site cap never pair (boilerplate guard)") {
    val boiler = (0 until 10).map(i => s"hot$i").mkString(" ")
    val rows = (1L to 8L).map(i => (i, s"$boiler only$i"))
    assert(run(rows, k = 10, cap = 4).isEmpty)
    // and at a permissive cap the same corpus pairs fully: C(8,2) rows
    assert(run(rows, k = 10, cap = 64).size == 28)
  }

  test("plan: digest equi-join, no cartesian product") {
    val rows = Seq((1L, s"$t10 x"), (2L, s"y $t10"))
    val plan = Dedup.sharedRunPairs(rows.toDF("doc_id", "text"), spanTokens = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$plan")
  }
}
