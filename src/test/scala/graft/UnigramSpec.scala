package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.plans.UnigramOps

/**
 * X79 Unigram-LM (Viterbi) subword encoding: the DP must be COST-OPTIMAL
 * (proven against brute-force enumeration of every segmentation), break
 * exact-cost ties toward the longest final piece, apply the all-or-nothing
 * [unk] rule, genuinely beat greedy longest-match where the optimum needs
 * lookahead, and the native expression must reproduce the reference DP on
 * real corpus rows.
 */
class UnigramSpec extends SparkSpec {

  private def vocabOf(pairs: (String, Int)*): UnigramOps.Vocab =
    new UnigramOps.Vocab(pairs.map { case (p, c) => p + "\u0001" + c })

  private val seedVocab = vocabOf(TextFunctions.UnigramSeedVocab: _*)

  test("Viterbi picks the minimum-cost segmentation (vs brute force)") {
    // brute force: enumerate every segmentation, min total cost
    val costs = TextFunctions.UnigramSeedVocab.toMap
    def brute(w: String): Option[Int] =
      if (w.isEmpty) Some(0)
      else (1 to w.length).flatMap { l =>
        costs.get(w.substring(0, l)).flatMap(c => brute(w.substring(l)).map(c + _))
      }.minOption
    val words = Seq("the", "thee", "data", "database", "streaming", "sorting",
      "filtered", "join", "joins", "window", "windows", "x9", "qzk", "rowdata")
    words.foreach { w =>
      val enc = UnigramOps.encodeWord(w, seedVocab)
      val expected = brute(w)
      assert(expected.nonEmpty, s"$w must segment under the seed vocab")
      val got = enc.map(p => costs(p)).sum
      assert(got == expected.get, s"$w: got ${enc.mkString("+")} cost $got, optimal ${expected.get}")
      assert(enc.mkString("") == w, s"$w: pieces must tile the word")
    }
  }

  test("exact-cost ties break toward the longest final piece") {
    // a=10, b=10, ab=20: both segmentations of "ab" cost 20 → pick "ab"
    val v = vocabOf("a" -> 10, "b" -> 10, "ab" -> 20)
    assert(UnigramOps.encodeWord("ab", v).toSeq == Seq("ab"))
    // and the tie is about the FINAL piece: "aab" ties a+ab vs a+a+b → ab last
    assert(UnigramOps.encodeWord("aab", v).toSeq == Seq("a", "ab"))
  }

  test("globally optimal where greedy longest-match is not") {
    // greedy takes "abc" (30); Viterbi finds ab+c = 22
    val v = vocabOf("a" -> 10, "b" -> 10, "c" -> 10, "ab" -> 12, "abc" -> 30)
    assert(UnigramOps.encodeWord("abc", v).toSeq == Seq("ab", "c"))
  }

  test("all-or-nothing [unk] on any uncoverable character") {
    assert(UnigramOps.encodeWord("na-ve", seedVocab).toSeq == Seq(UnigramOps.Unk))
    assert(UnigramOps.encodeWord("café", seedVocab).toSeq == Seq(UnigramOps.Unk))
    // covered chars segment fine
    assert(UnigramOps.encodeWord("cafe", seedVocab).mkString("") == "cafe")
  }

  test("native expression reproduces the reference DP on corpus rows") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    val rows = docs.select(col("doc_id"), col("text"),
      TextFunctions.unigramEncode(col("text")).as("arr")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getString(1).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty)
        .flatMap(w => UnigramOps.encodeWord(w, seedVocab))
      assert(r.getSeq[String](2) == expected.toSeq, s"doc ${r.getLong(0)}")
    }
  }

  test("property: DP cost equals brute-force minimum on random words and vocabs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
    // random small vocab: singles over {a,b,c} (so some words are coverable)
    // plus random multi-char pieces with random costs; 'z' stays uncovered
    val pieceGen = for {
      len <- Gen.choose(2, 4)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      cost <- Gen.choose(3, 40)
    } yield (cs.mkString, cost)
    val vocabGen = Gen.listOfN(6, pieceGen).map { multi =>
      (Seq("a" -> 10, "b" -> 11, "c" -> 12) ++ multi).distinctBy(_._1)
    }
    val wordGen = for {
      len <- Gen.choose(1, 10)
      cs <- Gen.listOfN(len, Gen.frequency(9 -> Gen.oneOf('a', 'b', 'c'),
        1 -> Gen.const('z')))
    } yield cs.mkString
    sample(vocabGen, 30, 7001L).zipWithIndex.foreach { case (vpairs, vi) =>
      val costs = vpairs.toMap
      val v = vocabOf(vpairs: _*)
      def brute(w: String): Option[Int] =
        if (w.isEmpty) Some(0)
        else (1 to w.length).flatMap { l =>
          costs.get(w.substring(0, l)).flatMap(c => brute(w.substring(l)).map(c + _))
        }.minOption
      sample(wordGen, 40, 9000L * (vi + 1)).foreach { w =>
        val enc = UnigramOps.encodeWord(w, v)
        brute(w) match {
          case None =>
            assert(enc.toSeq == Seq(UnigramOps.Unk), s"'$w' must be [unk] under $vpairs")
          case Some(opt) =>
            assert(enc.mkString("") == w, s"'$w' pieces must tile under $vpairs")
            assert(enc.map(costs).sum == opt,
              s"'$w': ${enc.mkString("+")} not optimal under $vpairs")
        }
      }
    }
  }

  test("encode is deterministic and a scan-stage projection (no exchange)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(col("doc_id"),
      TextFunctions.unigramEncode(col("text")).as("arr"))
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
    val a = q.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = q.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
  }

  /** Local hard-EM reference: the same seed statistics, floor-log2 cost
    * grid, smoothing and Viterbi (via the kernel's own encodeWord) as
    * unigramTrainDistributed — but single-threaded plain Scala. */
  private def localUnigramTrain(texts: Seq[String], iters: Int,
      maxPieceLen: Int = 4, maxWordLen: Int = 16, topMulti: Int = 64,
      reportK: Int = 40): Seq[(String, Long, Long)] = {
    val words = texts.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(w => w.nonEmpty && w.length <= maxWordLen)
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
    val sub = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; i <- 1 to w.length;
         l <- 1 to math.min(maxPieceLen, i))
      sub(w.substring(i - l, i)) = sub.getOrElse(w.substring(i - l, i), 0L) + c
    val singles = sub.filter(_._1.length == 1).toSeq
    val multis = sub.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(topMulti)
    val inv = (singles ++ multis).sortBy(_._1)
    def fl2(x: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var counts = inv.toMap
    var vocab: Seq[(String, Int)] = Nil
    var usage = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      val t = counts.values.sum
      vocab = inv.map { case (p, _) => (p, fl2(t) - fl2(counts(p)) + 1) }
      val v = new UnigramOps.Vocab(
        vocab.map { case (p, c) => p + "\u0001" + c })
      val u = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- words; p <- UnigramOps.encodeWord(w, v))
        u(p) = u.getOrElse(p, 0L) + c
      usage = u.toMap
      counts = inv.map { case (p, _) => (p, usage.getOrElse(p, 0L) + 1L) }.toMap
    }
    val costOf = vocab.toMap
    inv.map { case (p, _) => (p, usage.getOrElse(p, 0L), costOf(p).toLong) }
      .sortBy { case (p, u, _) => (-u, p) }.take(reportK)
  }

  test("distributed hard-EM training equals the local reference on corpus rows") {
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val want = localUnigramTrain(texts, iters = 2)
    val got = SparkEntry.queries("d_unigram_train")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("the E-step matters: iteration-2 costs differ from seed costs on a planted corpus") {
    import spark.implicits._
    // 'abab' words make seed substring counts favor 'ab'/'ba'/'aba'/'bab'
    // equally-ish, but the first Viterbi pass commits to specific pieces —
    // usage-derived costs must then diverge from the seed grid
    val docs = (Seq.fill(30)("abab cdcd abab") ++ Seq.fill(10)("ab cd") ++
      Seq("xyz zyx")).toDF("text")
    val one = TextFunctions.unigramTrainDistributed(docs, iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val two = TextFunctions.unigramTrainDistributed(docs, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(one.nonEmpty && two.nonEmpty)
    assert(one != two, "second EM round changed nothing — the loop is dead")
    // both settings still agree with the local reference
    val texts = Seq.fill(30)("abab cdcd abab") ++ Seq.fill(10)("ab cd") ++
      Seq("xyz zyx")
    assert(one == localUnigramTrain(texts, iters = 1))
    assert(two == localUnigramTrain(texts, iters = 2))
  }
}
