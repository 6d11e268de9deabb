package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Dedup

/**
 * Property-based adversarial coverage for the exact pair-finder family:
 * on RANDOM corpora (small token pools force heavy natural collisions —
 * the worst case for blocking/prefix schemes), every exact finder must
 * EQUAL brute-force all-pairs truth with caps disabled. Each property
 * runs over a deterministic sample of generated corpora (fixed seeds, so
 * failures reproduce).
 */
class PairFinderPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** pool-limited corpus: docs draw tokens from a small shared vocabulary */
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    poolSize <- Gen.choose(6, 16)
    nDocs <- Gen.choose(15, 40)
    docs <- Gen.sequence[Seq[Seq[Int]], Seq[Int]](
      (0 until nDocs).map(_ => Gen.nonEmptyListOf(Gen.choose(0, poolSize - 1))
        .map(_.take(12))))
  } yield docs.zipWithIndex.map { case (toks, i) =>
    (i.toLong, toks.map(t => s"t$t").mkString(" "))
  }

  private def grams(s: String, n: Int): Set[String] = {
    val toks = s.toLowerCase.trim.split("\\s+", -1)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("ngramJaccardPairs (cap disabled) equals brute truth on random pool corpora") {
    samples(corpusGen, 6, 1000L).foreach { rows =>
      val got = Dedup.ngramJaccardPairs(rows.toDF("doc_id", "text"), n = 2,
          threshold = 0.4, maxDocsPerShingle = None)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, ta) <- rows; (ib, tb) <- rows
        if ia < ib
        a = grams(ta, 2); b = grams(tb, 2)
        if a.nonEmpty && b.nonEmpty &&
          a.intersect(b).size.toDouble / a.union(b).size >= 0.4
      } yield (ia, ib)).toSet
      assert(got == want, s"extra=${got -- want} missing=${want -- got}\ncorpus=$rows")
    }
  }

  test("ppjoinPairs at n=1 (set-valued path, cap disabled) equals brute unigram truth") {
    samples(corpusGen, 6, 2000L).foreach { rows =>
      val got = Dedup.ppjoinPairs(rows.toDF("doc_id", "text"), n = 1,
          threshold = 0.5, maxDocsPerPrefixToken = None)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, ta) <- rows; (ib, tb) <- rows
        if ia < ib
        a = grams(ta, 1); b = grams(tb, 1)
        if a.intersect(b).size.toDouble / a.union(b).size >= 0.5
      } yield (ia, ib)).toSet
      assert(got == want, s"extra=${got -- want} missing=${want -- got}\ncorpus=$rows")
    }
  }

  test("containmentPairs (cap disabled) equals brute containment truth") {
    samples(corpusGen, 6, 3000L).foreach { rows =>
      val got = Dedup.containmentPairs(rows.toDF("doc_id", "text"), n = 2,
          threshold = 0.8, maxDocsPerShingle = None)
        .select("id_small", "id_big").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, ta) <- rows; (ib, tb) <- rows
        if ia < ib
        a = grams(ta, 2); b = grams(tb, 2)
        if a.nonEmpty && b.nonEmpty
        inter = a.intersect(b).size
        if inter.toDouble / math.min(a.size, b.size) >= 0.8
      } yield if (a.size <= b.size) (ia, ib) else (ib, ia)).toSet
      assert(got == want, s"extra=${got -- want} missing=${want -- got}\ncorpus=$rows")
    }
  }

  test("editDistancePairs at d=1 equals brute levenshtein truth on random short keys") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val keysGen: Gen[Seq[(Long, String)]] = for {
      nKeys <- Gen.choose(12, 30)
      keys <- Gen.sequence[Seq[String], String]((0 until nKeys).map(_ =>
        Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(8).mkString)))
    } yield keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
    samples(keysGen, 6, 4000L).foreach { rows =>
      val got = Dedup.editDistancePairs(rows.toDF("doc_id", "key"), d = 1,
          maxDocsPerSegment = None)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, ka) <- rows; (ib, kb) <- rows
        if ia < ib && ka.length >= 2 && kb.length >= 2 && lev(ka, kb) <= 1
      } yield (ia, ib)).toSet
      assert(got == want, s"extra=${got -- want} missing=${want -- got}\nkeys=$rows")
    }
  }

  test("exactDedup keeps one winner per distinct normalized text, dup counts conserve") {
    samples(corpusGen, 6, 5000L).foreach { rows =>
      val out = Dedup.exactDedup(rows.toDF("doc_id", "text")).collect()
      val norm = rows.groupBy(_._2.toLowerCase.trim.replaceAll("\\s+", " "))
      assert(out.length == norm.size, s"survivors ${out.length} != ${norm.size} groups")
      assert(out.map(_.getLong(2)).sum == rows.length, "dup counts must conserve rows")
    }
  }
}
