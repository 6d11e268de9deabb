package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * X87 distributed WordPiece training: a local Scala reference of the
 * integer likelihood grid (floor(cab·1e9/(ca·cb)), ties → pair ASC, same
 * two-pass rewrite), the documented divergence from the frequency
 * objective (X84) on the same corpus, and tie-breaking. The
 * d_wordpiece_train oracle replays all eight iterations in SQL.
 */
class WordPieceTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference: same semantics as wordpieceTrainDistributed, driver
    * Scala over a (word, cnt) map. */
  private def localTrain(words0: Map[String, Long], n: Int): Seq[(String, Long, Long)] = {
    var words = words0.map { case (w, c) => (w.toSeq.map(_.toString).mkString(" "), c) }
    val out = Seq.newBuilder[(String, Long, Long)]
    for (_ <- 1 to n) {
      val syms = scala.collection.mutable.Map.empty[String, Long]
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (seg, c) =>
        val s = seg.split(' ')
        s.foreach(x => syms(x) = syms.getOrElse(x, 0L) + c)
        s.sliding(2).filter(_.length == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (pairs.nonEmpty) {
        val scored = pairs.toSeq.map { case ((a, b), cab) =>
          (s"$a $b", cab * 1000000000L / (syms(a) * syms(b)), cab)
        }
        val best = scored.minBy { case (p, s, _) => (-s, p) }
        out += best
        words = words.map { case (seg, c) =>
          (TextFunctions.mergeSeg(seg, best._1), c)
        }
      }
    }
    out.result()
  }

  test("distributed trainer matches the local likelihood reference on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counts = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .where(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = localTrain(counts, 8)
    val (got, words) = TextFunctions.wordpieceTrainDistributed(docs, 8)
    assert(got.map(m => (m._2, m._3, m._4)) == want)
    assert(got.map(_._1) == (1 to 8))
    // segments still reassemble the words
    val broken = words.where(replace(col("seg"), lit(" "), lit("")) =!= col("w"))
    assert(broken.count() == 0L)
  }

  test("likelihood and frequency objectives diverge on the fixture corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (freq, _) = TextFunctions.bpeTrainDistributed(docs, 8)
    val (lik, _) = TextFunctions.wordpieceTrainDistributed(docs, 8)
    // same loop, different argmax — if these ever agree the likelihood
    // score has degenerated to frequency (e.g. a broken symbol-count join)
    assert(freq.map(_._2) != lik.map(_._2))
  }

  test("tie-break: equal scores go to the lexicographically smallest pair") {
    val docs = Seq("xy", "zw").toDF("text")
    // both pairs score 1e9/(1·1); 'x y' sorts first
    val (merges, _) = TextFunctions.wordpieceTrainDistributed(docs, 1)
    assert(merges.head._2 == "x y" && merges.head._3 == 1000000000L)
  }
}
