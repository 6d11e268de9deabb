package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/**
 * X48 PassJoin edit-distance pairs: the segment pigeonhole guarantees
 * recall, the levenshtein verify guarantees precision — so the operator
 * must EQUAL brute-force all-pairs on any corpus. Exercised with
 * substitutions, insertions, and deletions (the shift bound only matters
 * for the latter two), plus the hot-bucket cap contract.
 */
class EditDistancePairsSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ka) <- rows; (ib, kb) <- rows
      if ia < ib && ka.length >= d + 1 && kb.length >= d + 1
      e = lev(ka, kb) if e <= d
    } yield (ia, ib, e)).toSet

  private def run(rows: Seq[(Long, String)], d: Int,
      cap: Option[Int] = Some(1000)): Set[(Long, Long, Int)] =
    Dedup.editDistancePairs(rows.toDF("doc_id", "key"), d = d,
        maxDocsPerSegment = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("equals brute-force all-pairs on a corpus of substitutions, inserts, deletes") {
    val rng = new scala.util.Random(7)
    val base = (0 until 80).map(i =>
      (i.toLong, (0 until 12 + rng.nextInt(8)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString))
    // planted variants of every kind at distances 1..3
    val variants = base.take(30).zipWithIndex.map { case ((id, s), j) =>
      val v = j % 3 match {
        case 0 => s.updated(j % s.length, 'z')                       // substitution
        case 1 => s.substring(0, j % s.length) + "q" + s.substring(j % s.length) // insertion
        case _ => s.substring(0, j % (s.length - 1)) + s.substring(j % (s.length - 1) + 1) // deletion
      }
      (1000L + id, v)
    }
    val corpus = base ++ variants
    for (d <- 1 to 3) {
      val got = run(corpus, d)
      val want = brute(corpus, d)
      assert(got == want,
        s"d=$d: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
      assert(want.nonEmpty, s"d=$d: degenerate test corpus — no true pairs")
    }
  }

  test("distance-0 pairs (exact key dupes) are included; beyond-d pairs are not") {
    val rows = Seq((1L, "identical-key"), (2L, "identical-key"),
      (3L, "totally different"), (4L, "identical-kex"))
    val got = run(rows, d = 1)
    assert(got == Set((1L, 2L, 0), (1L, 4L, 1), (2L, 4L, 1)))
  }

  test("keys shorter than d+1 are excluded (zero-length segments would match everywhere)") {
    val rows = Seq((1L, "ab"), (2L, "ac"), (3L, "longer-key"), (4L, "longer-kex"))
    val got = run(rows, d = 2)
    assert(got == Set((3L, 4L, 1)))
  }

  test("hot-bucket cap drops flooded segments wholesale; None restores exact recall") {
    // 50 keys sharing every segment (identical), one distinct near-pair
    val flood = (0 until 50).map(i => (i.toLong, "aaaaaabbbbbbcccccc"))
    val pair = Seq((100L, "xyzuvwpqrstu"), (101L, "xyzuvwpqrstx"))
    val capped = run(flood ++ pair, d = 1, cap = Some(10))
    assert(capped == Set((100L, 101L, 1)), s"flooded bucket must drop: $capped")
    val exact = run(flood ++ pair, d = 1, cap = None)
    assert(exact.size == 50 * 49 / 2 + 1)
  }

  test("candidate generation is an equi hash join — no nested-loop product") {
    val rows = (0 until 40).map(i => (i.toLong, s"prefix-$i-suffix-padding"))
    val plan = Dedup.editDistancePairs(rows.toDF("doc_id", "key"), d = 2)
      .queryExecution.executedPlan.toString
    val prePlan = plan.split("== Initial Plan ==")(0)
    assert(!prePlan.contains("CartesianProduct") &&
      !prePlan.contains("BroadcastNestedLoopJoin"), prePlan.take(2000))
  }
}
