package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Boundary/invariant specs for the sampling and packing ops whose bulk
  * behavior is oracle-checked (d_hash_sample, d_pack_sequences). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val ids = spark.range(10000).toDF("doc_id")

  test("hashSample: 0% keeps nothing, 100% keeps everything, 10% is ~10% and deterministic") {
    assert(ids.where(TextFunctions.hashSample(col("doc_id"), 0)).count() === 0)
    assert(ids.where(TextFunctions.hashSample(col("doc_id"), 100)).count() === 10000)
    val n = ids.where(TextFunctions.hashSample(col("doc_id"), 10)).count()
    assert(n > 700 && n < 1300, s"10% sample of 10k was $n")
    val again = ids.where(TextFunctions.hashSample(col("doc_id"), 10)).count()
    assert(n === again) // same ids every run — no rand()
  }

  test("hashSample is stable under corpus growth: a doc's fate never changes") {
    val small = ids.limit(1000).where(TextFunctions.hashSample(col("doc_id"), 25))
      .as[Long].collect().toSet
    val large = ids.where(TextFunctions.hashSample(col("doc_id"), 25))
      .as[Long].collect().toSet
    assert(small.subsetOf(large))
    assert(large.filter(_ < 1000) === small)
  }

  test("piiScrubbed: redacts planted emails/phones, leaves near-misses alone") {
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@sub.example.co.uk or 555-123-4567 ok"),
      (2L, "no pii here, just words and 12345 numbers"),
      (3L, "two mails a@b.io c@d.org one phone 111 222 3333"),
      (4L, "not-a-phone 12-345-6789 and not-an-email foo@bar (no tld)"))
      .toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
      TextFunctions.patternCount(col("text"), TextFunctions.EmailPattern).as("e"),
      TextFunctions.patternCount(col("text"), TextFunctions.PhonePattern).as("p"),
      TextFunctions.piiScrubbed(col("text")).as("s"))
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(out.map(r => (r._2, r._3)).toSeq === Seq((1, 1), (0, 0), (2, 1), (0, 0)))
    assert(out(0)._4 === "reach me at <EMAIL> or <PHONE> ok")
    assert(out(2)._4 === "two mails <EMAIL> <EMAIL> one phone <PHONE>")
    assert(out(3)._4 === rows.where(col("doc_id") === 4).select("text").as[String].head())
  }

  test("topTokenCount: sorted run-length pass equals a naive per-token count") {
    val docs = Seq(
      (1L, "a b a c a b"),            // a×3
      (2L, "solo"),                   // 1
      (3L, "x x x x"),                // 4
      (4L, "  Tie tie BOTH both  "))  // lowercased → tie×2, both×2
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), TextFunctions.topTokenCount(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 4, 4L -> 2))
    val naive = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(max("count").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got.view.mapValues(_.toLong).toMap === naive)
  }

  test("dedupKeepBest keeps the highest-ranked copy per content group, with deterministic ties") {
    val docs = Seq(
      (10L, "same   text here"),      // normalizes equal to 11/12
      (11L, "same text  here"),
      (12L, "same text here"),
      (20L, "short"),
      (21L, "a longer unique document with many tokens"))
      .toDF("doc_id", "text")
    val kept = graft.functions.Dedup.dedupKeepBest(docs,
      Seq(TextFunctions.tokenCount(col("text")).desc))
      .select(col("doc_id"), col("dup_count")).as[(Long, Long)].collect().toMap
    // the trio ties on token count (3 each) → lowest id wins the tie-break
    assert(kept === Map(10L -> 3L, 20L -> 1L, 21L -> 1L))
    // ranking actually bites: make one copy longer and it wins regardless of id
    val docs2 = Seq(
      (30L, "dup dup"), (31L, "dup dup dup")).toDF("doc_id", "text")
    val kept2 = graft.functions.Dedup.dedupKeepBest(docs2,
      Seq(TextFunctions.tokenCount(col("text")).desc))
      .select(col("doc_id")).as[Long].collect().toSeq.sorted
    assert(kept2 === Seq(30L, 31L)) // different content hashes — both survive
    val docs3 = Seq(
      (40L, "pick me not"), (41L, "pick  me  not"), (42L, "pick me not really"))
      .toDF("doc_id", "text")
    val kept3 = graft.functions.Dedup.dedupKeepBest(docs3,
      Seq(TextFunctions.tokenCount(col("text")).desc))
      .select(col("doc_id"), col("dup_count")).as[(Long, Long)].collect().toMap
    assert(kept3 === Map(40L -> 2L, 42L -> 1L))
  }

  test("packSequences: packs respect the budget unless a single doc exceeds it") {
    val docs = (0 until 200).map { i =>
      // doc i has i%7+1 words; shard by i%3
      (i.toLong, Seq.fill(i % 7 + 1)("w").mkString(" "), s"s${i % 3}")
    }.toDF("doc_id", "text", "source")
    val packed = TextFunctions.packSequences(docs, budgetTokens = 10L, shardCol = "source")
    val packTotals = packed.groupBy("shard", "pack_id").agg(sum("n_tokens").as("tot"))
      .as[(String, Long, Long)].collect()
    // exclusive-prefix assignment: a pack's first doc starts under the
    // budget, so a pack can overflow by at most (maxDocTokens - 1)
    assert(packTotals.forall(_._3 < 10 + 7))
    // pack ids are dense consecutive ranges per shard
    packed.select("shard", "pack_id").distinct().as[(String, Long)].collect()
      .groupBy(_._1).foreach { case (_, ps) =>
        val sorted = ps.map(_._2).sorted
        assert(sorted === (0L until sorted.length.toLong).toArray)
      }
    // every doc lands in exactly one pack
    assert(packed.count() === 200)
    assert(packed.select("doc_id").distinct().count() === 200)
  }

  test("topTokensPerSource ranks document frequency with deterministic ties") {
    val docs = Seq(
      (1L, "a b c", "s1"), (2L, "a b", "s1"), (3L, "a x", "s1"),
      (4L, "z z z", "s2"), (5L, "z y", "s2")).toDF("doc_id", "text", "source")
    val top = TextFunctions.topTokensPerSource(docs, 2)
      .orderBy("source", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    // repeated tokens inside one doc count once (df, not term frequency);
    // df ties (c vs x) fall outside k=2, b wins rank 2 outright.
    assert(top === Seq(
      ("s1", "a", 3L, 1L), ("s1", "b", 2L, 2L),
      ("s2", "z", 2L, 1L), ("s2", "y", 1L, 2L)))
  }

  test("dedupAgainstKnown drops exactly the content the known plane already has") {
    val known = graft.functions.Dedup.withContentHash(
      Seq((1L, "hello world")).toDF("doc_id", "text")).select("content_hash")
    val batch = Seq(
      (10L, "hello   WORLD"), // normalizes to known content → dropped
      (11L, "fresh content"), (12L, "fresh content") // intra-batch dups survive (cross-run op)
    ).toDF("doc_id", "text")
    val kept = graft.functions.Dedup.dedupAgainstKnown(batch, known)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L, 12L))
  }

  test("temperatureMixSources lands each source near its geometric-mean target on a skewed corpus") {
    // 1600 / 400 / 100 docs: targets are sqrt(1600·100)=400, sqrt(400·100)=200, 100
    val docs = ((0 until 1600).map(i => ("big", i.toLong)) ++
      (0 until 400).map(i => ("mid", 10000L + i)) ++
      (0 until 100).map(i => ("small", 20000L + i)))
      .toDF("source", "doc_id")
    val kept = TextFunctions.temperatureMixSources(docs)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // md5-threshold sampling: expected counts hit the target in expectation;
    // allow 4-sigma binomial slack
    def near(src: String, target: Double): Unit = {
      val n = kept(src).toDouble
      val sd = math.sqrt(target)
      assert(math.abs(n - target) < 4 * sd + 1, s"$src kept $n, target $target")
    }
    near("big", 400.0); near("mid", 200.0)
    assert(kept("small") == 100L) // smallest source keeps everything exactly
    // deterministic: a second run keeps the identical document set
    val a = TextFunctions.temperatureMixSources(docs).collect().map(_.toSeq).toSet
    val b = TextFunctions.temperatureMixSources(docs).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("heavyHitterTokens stays exact under eviction pressure (k far below vocab)") {
    // 400 distinct rare tokens + 'hot' x200: N=600, k=8 counters, so MG
    // evicts constantly — but freq(hot)=200 > N/(k+1)≈67 guarantees hot
    // survives every per-partition sketch, and the recount is exact
    val rows = (1 to 400).map(i => s"rare$i") ++ Seq.fill(200)("hot")
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val top = graft.functions.TextFunctions.heavyHitterTokens(df, m = 1, k = 8)
      .as[(String, Long)].collect()
    assert(top.toSeq == Seq(("hot", 200L)))
  }

  test("heavyHitterTokens matches the full groupBy truth when k exceeds the vocab") {
    val df = Seq((1L, "a b b c c c d d d d"), (2L, "d c b a a")).toDF("doc_id", "text")
    val top = graft.functions.TextFunctions.heavyHitterTokens(df, m = 3, k = 64)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("d", 5L), ("c", 4L), ("a", 3L)))
  }

  test("carveContextWindows cuts exact-ctx examples across document boundaries") {
    // shard A: docs of 3, 4, 2 tokens; ctx=4 → examples [0,4)=docs 1+2,
    // [4,8)=docs 2+3, [8,9)=doc 3 (1 token, final partial)
    // (an empty text still counts 1 token — tokens("") = [""], the corpus-
    // wide tokenizer convention every oracle shares; the n_tokens>0 guard
    // exists for counters that can return 0, e.g. BPE over empty docs)
    val docs = Seq(
      (1L, "a", "t1 t2 t3"), (2L, "a", "u1 u2 u3 u4"), (3L, "a", "v1 v2"),
      (4L, "b", "w1 w2 w3 w4 w5"), (5L, "b", "x1"))
      .toDF("doc_id", "shard", "text")
    val got = graft.functions.TextFunctions
      .carveContextWindows(docs, ctxTokens = 4L, shardCol = "shard")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got(("a", 0L)) == (1L, 2L, 2L, 4L)) // 3 from doc1 + 1 from doc2
    assert(got(("a", 1L)) == (2L, 3L, 2L, 4L)) // 3 from doc2 + 1 from doc3
    assert(got(("a", 2L)) == (3L, 3L, 1L, 1L)) // final partial
    assert(got(("b", 0L)) == (4L, 4L, 1L, 4L)) // first 4 of doc4
    assert(got(("b", 1L)) == (4L, 5L, 2L, 2L)) // doc4 tail + doc5, crossing
    assert(got.size == 5)
    // conservation: example token counts sum to the corpus token count
    assert(got.values.map(_._4).sum == 3 + 4 + 2 + 5 + 1)
  }

  test("bigramLmScore matches a hand-computed interpolated model on a tiny corpus") {
    // corpus: "a b a b" (bigrams: a·b ×2, b·a ×1) + "c c" (c·c ×1)
    // unigrams: a×2 b×2 c×2, N=6. Full table (topK=64, no cap binding):
    //   P(b|a)=0.75·(2/2)+0.25·(2/6);  P(a|b)=0.75·(1/1)+0.25·(2/6)
    //   P(c|c)=0.75·(1/1)+0.25·(2/6)
    val docs = Seq((1L, "a b a b"), (2L, "c c")).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions.bigramLmScore(docs, topK = 64)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def b(p: Double) = -math.log(p) / math.log(2.0)
    val pAB = 0.75 * (2.0 / 2.0) + 0.25 * (2.0 / 6.0)
    val pBA = 0.75 * (1.0 / 1.0) + 0.25 * (2.0 / 6.0)
    val pCC = 0.75 * (1.0 / 1.0) + 0.25 * (2.0 / 6.0)
    assert(got(1L)._2 == 3 && got(2L)._2 == 1)
    assert(math.abs(got(1L)._1 - (b(pAB) * 2 + b(pBA)) / 3) < 1e-6)
    assert(math.abs(got(2L)._1 - b(pCC)) < 1e-6)
  }

  test("bigramLmScore backoff: below-cap bigrams pay the unigram floor") {
    // 20 docs of one hot bigram + 1 doc of a singleton bigram; topK=1 keeps
    // only the hot bigram, so the singleton doc backs off to 0.25·P_uni and
    // must score strictly worse (higher bits) than the hot docs
    val docs = ((1 to 20).map(i => (i.toLong, "x y")) :+ (99L, "p q")).toDF("doc_id", "text")
    val got = graft.functions.TextFunctions.bigramLmScore(docs, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(99L) > got(1L) + 1.0,
      s"backoff doc must score well above in-table docs: $got")
  }

  test("bigramLmScore model frames broadcast — the corpus stream never sort-merge-joins") {
    val docs = (1 to 50).map(i => (i.toLong, s"tok$i common tail")).toDF("doc_id", "text")
    val plan = graft.functions.TextFunctions.bigramLmScore(docs)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }
}
