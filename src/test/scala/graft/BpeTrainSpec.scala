package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.BpeOps

/**
 * X84 distributed BPE training: the padded two-pass merge rewrite's
 * fixpoint property (the cross-engine replay hinges on it), agreement with
 * BpeOps.train's textbook list-walk on run-free corpora (and the stated
 * divergence shape on runs ≥ 5), tie-breaking, and the bounded-collect
 * discipline. The SQL oracles (d_bpe_train / d_bpe_train_segments) replay
 * all eight iterations end-to-end; this spec owns the semantics.
 */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSeg: two passes reach the fixpoint on every run shape") {
    // deterministic sweep over the shapes that stress resume-after-match:
    // runs of one symbol, alternating pairs, mixed contexts
    for (k <- 1 to 12) {
      val run = Seq.fill(k)("a").mkString(" ")
      val out = TextFunctions.mergeSeg(run, "a a")
      assert(!(" " + out + " ").contains(" a a "), s"run $k left a match: '$out'")
      // a third pass must be a no-op (what makes two passes canonical)
      assert(TextFunctions.mergeSeg(out, "a a") == out)
      val alt = Seq.fill(k)("a b").mkString(" ")
      val out2 = TextFunctions.mergeSeg(alt, "a b")
      assert(!(" " + out2 + " ").contains(" a b "), s"alt $k left a match: '$out2'")
      assert(out2 == Seq.fill(k)("ab").mkString(" "))
    }
    // mixed neighborhood: the pair bounded by other symbols
    assert(TextFunctions.mergeSeg("x a b a b y a b", "a b") == "x ab ab y ab")
  }

  test("mergeSeg equals the textbook list-walk except same-symbol runs >= 5") {
    def listWalk(seg: String, a: String, b: String): String =
      BpeOps.mergePair(seg.split(' ').toIndexedSeq, a, b).mkString(" ")
    // run-free and short-run segments: identical
    for (seg <- Seq("f a s t", "a b a b a b", "s m a l l", "a a a a", "a a a"))
      assert(TextFunctions.mergeSeg(seg, "a a") == listWalk(seg, "a", "a") ||
        !seg.contains("a a"),
        s"diverged on '$seg'")
    assert(TextFunctions.mergeSeg("a b a b a b", "a b") ==
      listWalk("a b a b a b", "a", "b"))
    // the documented divergence: run of 5 — same multiset, different split
    assert(TextFunctions.mergeSeg("a a a a a", "a a") == "aa a aa")
    assert(listWalk("a a a a a", "a", "a") == "aa aa a")
  }

  test("distributed trainer matches BpeOps.train on the run-free fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // precondition for exact agreement: no word carries a same-char run >= 5
    val runWords = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .where(col("w").rlike("(.)\\1{4,}")).count()
    assert(runWords == 0L, "fixture grew same-char runs >= 5; agreement caveat broken")
    val (merges, words) = TextFunctions.bpeTrainDistributed(docs, 8)
    val vocab = docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .where(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = BpeOps.train(vocab, 8).map { case (a, b) => s"$a $b" }
    assert(merges.map(_._2) == want)
    // and the steps number 1..8 with positive counts
    assert(merges.map(_._1) == (1 to 8))
    assert(merges.forall(_._3 > 0))
    // the final plane's segments reassemble the original words
    val broken = words.where(replace(col("seg"), lit(" "), lit("")) =!= col("w"))
    assert(broken.count() == 0L)
  }

  test("tie-break: equal counts go to the lexicographically smallest pair") {
    // within-word pairs: xy → (x y), zw → (z w), xyzw → (x y)(y z)(z w);
    // 'x y' and 'z w' both count 2 — 'x y' sorts first
    val docs = Seq("xy", "zw", "xyzw").toDF("text")
    val (merges, _) = TextFunctions.bpeTrainDistributed(docs, 1)
    assert(merges.head._2 == "x y" && merges.head._3 == 2L)
  }

  test("exhausted corpus stops early: fewer merges than requested") {
    val docs = Seq("ab").toDF("text")
    // after 'a b' merges there are no pairs left — ask for 5, get 1
    val (merges, words) = TextFunctions.bpeTrainDistributed(docs, 5)
    assert(merges.map(_._2) == Seq("a b"))
    assert(words.select("seg").as[String].collect().toSeq == Seq("ab"))
  }
}
