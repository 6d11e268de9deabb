package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity}

/**
 * Planted-duplicate and recall specs for the approximate (no-SQL-oracle)
 * dedup/ANN paths — the correctness net VERDICT r1 required for
 * d_minhash_pairs / d_simhash_pairs / e_lsh_*.
 */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val base1 =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby today"
  private val base2 =
    "a completely different report about quarterly revenue growth in the northern sales region during winter months overall"
  private val base3 =
    "recipe instructions for baking sourdough bread with wild yeast starter and high hydration dough technique daily"

  /** 30 distinct docs + 3 planted near-dup pairs (small token edits on three
    * mutually dissimilar bases). */
  private lazy val docs = {
    val distinct = (0 until 30).map(i =>
      (i.toLong, s"document number $i talks about topic $i with unique words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val planted = Seq(
      (100L, base1), (101L, base1.replace("dog", "dog quietly")),
      (200L, base2), (201L, base2.replace("overall", "generally")),
      (300L, base3.toUpperCase), (301L, base3.toUpperCase.replace("DAILY", "NIGHTLY")))
    (distinct ++ planted).toDF("doc_id", "text")
  }

  private val plantedPairs = Set((100L, 101L), (200L, 201L), (300L, 301L))

  test("minhashPairs finds every planted near-dup pair and no cross-topic noise") {
    val pairs = Dedup.minhashPairs(docs, k = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(plantedPairs.subsetOf(pairs), s"missing: ${plantedPairs -- pairs}")
    // no pair between distinct topical docs (ids < 100)
    assert(!pairs.exists { case (a, b) => a < 100 && b < 100 })
  }

  test("minhash est_jaccard tracks exact n-gram jaccard within banding tolerance") {
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.4)
      .select(col("id_a"), col("id_b"), col("jaccard")).as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    val est = Dedup.minhashPairs(docs, threshold = 0.4)
      .select(col("id_a"), col("id_b"), col("est_jaccard")).as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    exact.keySet.intersect(est.keySet).foreach { k =>
      assert(math.abs(exact(k) - est(k)) < 0.35, s"$k exact=${exact(k)} est=${est(k)}")
    }
  }

  test("minhashDedup removes exactly the doomed right-hand members") {
    val survivors = Dedup.minhashDedup(docs, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(!survivors.contains(101L) && !survivors.contains(201L) && !survivors.contains(301L))
    assert(survivors.contains(100L) && survivors.contains(200L) && survivors.contains(300L))
    assert((0 until 30).forall(i => survivors.contains(i.toLong)))
  }

  test("sortedNeighborPairs matches a local sort+window+exact-jaccard model") {
    val result = Dedup.sortedNeighborPairs(docs, window = 2, threshold = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard")).as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    // planted near-dups share long prefixes, so they sort adjacent and the
    // window must find all three (base3 only via lower() normalization)
    assert(plantedPairs.subsetOf(result.keySet), s"missing: ${plantedPairs -- result.keySet}")

    // local model: same normalized key, same window, exact-jaccard verify
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.0, maxDocsPerShingle = None)
      .select(col("id_a"), col("id_b"), col("jaccard")).as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    val order = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, tx) => (tx.trim.toLowerCase.replaceAll("\\s+", " "), id) }
      .sortBy(identity).map(_._2)
    val expected = (for {
      i <- order.indices; d <- 1 to 2 if i + d < order.length
      p = (math.min(order(i), order(i + d)), math.max(order(i), order(i + d)))
      j <- exact.get(p) if j >= 0.5
    } yield p -> j).toMap
    assert(result == expected, s"diff: ${(result.keySet -- expected.keySet)} / ${(expected.keySet -- result.keySet)}")
  }

  test("bloomDedupAgainstKnown equals the exact anti-join at any fpp") {
    val known = Dedup.withContentHash(docs.where(col("doc_id") >= 100))
      .select("content_hash")
    val newDocs = docs.where(col("doc_id") < 100 || col("doc_id") % 2 === 1)
    val exact = Dedup.dedupAgainstKnown(newDocs, known)
      .select("doc_id").as[Long].collect().toSet
    // tight fpp: almost all negatives skip the confirm join
    val tight = Dedup.bloomDedupAgainstKnown(newDocs, known, fpp = 0.001)
      .select("doc_id").as[Long].collect().toSet
    assert(tight == exact)
    // absurd fpp floods the confirm path with false positives — the exact
    // verify must kill every one of them
    val loose = Dedup.bloomDedupAgainstKnown(newDocs, known, fpp = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(loose == exact)
    // the planted dupes (odd ids >= 100 appear in both planes) are dropped
    assert(!exact.contains(101L) && !exact.contains(201L) && !exact.contains(301L))
  }

  test("connectedComponents: chains collapse to min-id labels, isolated pairs stay separate") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L && comps(7L) == 1L)
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("connectedComponents: a chain LONGER than maxIters converges (pointer jumping)") {
    // diameter 59 ≫ maxIters 20: plain one-hop min-label propagation could
    // never finish inside the bound; the per-round label-of-label shortcut
    // doubles reach, so ~log2(59) ≈ 6 rounds suffice
    val pairs = (0 until 59).map(i => (i.toLong, i.toLong + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comps.size == 60)
    assert(comps.values.forall(_ == 0L), s"unconverged labels: ${comps.filter(_._2 != 0L)}")
  }

  test("segmentDedup: cross-doc boilerplate survives only at its first occurrence") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // exactly one 10-token window
    val uniq = (id: Int) => (1 to 10).map(i => s"u${id}w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$boiler ${uniq(1)}"),          // first occurrence: keeps both segments
      (2L, s"${uniq(2)} $boiler"),          // later occurrence: boilerplate dropped
      (3L, s"$boiler"))                     // only boilerplate: everything dropped
      .toDF("doc_id", "text")
    val out = graft.functions.Dedup.segmentDedup(corpus)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, s"$boiler ${uniq(1)}", 2L, 0L)))
    assert(out(2L) == ((2L, uniq(2), 1L, 1L)))
    assert(out(3L) == ((3L, "", 0L, 1L)), "a fully-boilerplate doc keeps an empty row, not no row")
  }

  test("boilerplateScrub drops over-threshold segments from EVERY doc, threshold-inclusive") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    val shared = (1 to 10).map(i => s"s$i").mkString(" ") // in exactly 2 docs
    val uniq = (id: Int) => (1 to 10).map(i => s"u${id}w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$boiler ${uniq(1)} $shared"), // boiler df=3 > 2: dropped even here
      (2L, s"${uniq(2)} $boiler"),
      (3L, s"$boiler $shared"),            // shared df=2 <= 2: kept in both
      (4L, uniq(4)))
      .toDF("doc_id", "text")
    val out = graft.functions.Dedup.boilerplateScrub(corpus, maxDocFreq = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, s"${uniq(1)} $shared", 2L, 1L)),
      "the FIRST occurrence must be scrubbed too (no winner)")
    assert(out(2L) == ((2L, uniq(2), 1L, 1L)))
    assert(out(3L) == ((3L, shared, 1L, 1L)))
    assert(out(4L) == ((4L, uniq(4), 1L, 0L)))
  }

  test("boilerplateScrub counts DISTINCT docs: within-doc repetition is not boilerplate") {
    val seg = (1 to 10).map(i => s"r$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$seg $seg $seg $seg"), // 4 occurrences, ONE doc: df=1, all kept
      (2L, (1 to 10).map(i => s"o$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.functions.Dedup.boilerplateScrub(corpus, maxDocFreq = 2)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 4L && out(1L)._4 == 0L,
      s"within-doc repeats must not count toward doc frequency: ${out(1L)}")
  }

  test("minhashDedupComponents keeps exactly one doc per transitive near-dup chain") {
    // A ≈ B ≈ C chain on a base disjoint from every other planted family:
    // B is the base, A and C are small DIFFERENT edits of B (A ≈ C only
    // transitively, through B)
    val base4 = "annual migration patterns of arctic terns crossing hemispheres " +
      "with record flight distances measured by satellite tags every season"
    val chain = Seq(
      (400L, base4.replace("annual", "yearly")),
      (401L, base4),
      (402L, base4.replace("every season", "each season")))
    val corpus = docs.unionByName(chain.toDF("doc_id", "text"))
    val survivors = Dedup.minhashDedupComponents(corpus, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // one survivor per component, carrying the component's min id
    assert(survivors.contains(100L) && !survivors.contains(101L))
    assert(survivors.intersect(Set(400L, 401L, 402L)) == Set(400L))
    assert((0 until 30).forall(i => survivors.contains(i.toLong)))
  }

  test("simhashPairs finds planted pairs within hamming 3 via pigeonhole blocking") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // single-word edits on a 19-token doc stay within a few simhash bits
    assert(pairs.exists { case (a, b) => plantedPairs.contains((a, b)) })
    assert(!pairs.exists { case (a, b) => a < 100 && b < 100 })
  }

  test("identical-signature floods collapse to O(N) star pairs regardless of cap") {
    // 200 byte-identical docs share one signature → the exact-signature
    // collapse emits 199 (rep=min id, member) star pairs and ONE banding row,
    // so the cap never fires and can never drop a true duplicate flood.
    val flood = (0 until 200).map(i => (i.toLong, "same text every time")).toDF("doc_id", "text")
    val expected = (1 until 200).map(i => (0L, i.toLong)).toSet
    val capped = Dedup.minhashPairs(flood, maxBucketSize = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == expected)
    val uncapped = Dedup.minhashPairs(flood, maxBucketSize = 100000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped == expected)
  }

  test("bucket cap drops hot buckets of DISTINCT signatures instead of going quadratic") {
    // 40 distinct small edits of one base: every signature is distinct, but
    // the docs agree on most signature positions, so un-edited band buckets
    // hold all 40 docs. A small cap drops those hot buckets; edited positions
    // hash to unique per-doc buckets (size 1), which pair nothing.
    val base = "the quick brown fox jumps over the lazy dog while the cat watches from " +
      "the warm windowsill nearby today and every sentence keeps flowing with more words"
    val words = base.split(" ")
    val nearDups = (0 until 40).map { i =>
      (i.toLong, words.updated(i % words.length, s"edit$i").mkString(" "))
    }.toDF("doc_id", "text")
    val sigs = Dedup.minhashPairs(nearDups, threshold = 0.5, maxBucketSize = 100000)
    val uncappedCount = sigs.count()
    assert(uncappedCount > 0, "near-dup edits should pair when uncapped")
    val capped = Dedup.minhashPairs(nearDups, threshold = 0.5, maxBucketSize = 5)
    assert(capped.count() < uncappedCount,
      "a cap below the hot-bucket size must drop candidate pairs")
  }

  test("ngram hot-shingle cap: skew-free corpora are unchanged; a hot-shingle flood stops pairing") {
    // On the planted corpus no shingle approaches the default cap, so the
    // capped plan (exact re-verify) must equal the fully exact one, value for
    // value.
    val exact = Dedup.ngramJaccardPairs(docs, threshold = 0.2, maxDocsPerShingle = None)
      .as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped == exact)

    // Flood: 50 docs whose ONLY shared shingle is one hot trigram — uncapped
    // they pair quadratically (C(50,2) candidates); with the shingle over the
    // cap they stop pairing entirely, while a planted pair that shares COLD
    // shingles survives with its exact jaccard.
    val flood = (0 until 50).map(i => (1000L + i, s"spam spam spam spam unique$i"))
    val planted = Seq(
      (2000L, "alpha beta gamma delta epsilon"),
      (2001L, "alpha beta gamma delta zeta"))
    val corpus = (flood ++ planted).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(corpus, threshold = 0.2, maxDocsPerShingle = None)
      .as[(Long, Long, Double)].collect()
    assert(uncapped.count { case (a, b, _) => a >= 1000L && a < 2000L && b < 2000L } == 50 * 49 / 2)
    val withCap = Dedup.ngramJaccardPairs(corpus, threshold = 0.2, maxDocsPerShingle = Some(10))
      .as[(Long, Long, Double)].collect()
    assert(!withCap.exists { case (a, b, _) => a >= 1000L && a < 2000L && b < 2000L },
      "hot-shingle-only candidates must drop under the cap")
    // the cold-shingle pair survives both plans with the same exact value
    assert(uncapped.contains((2000L, 2001L, 0.5)))
    assert(withCap.toSeq.contains((2000L, 2001L, 0.5)))
  }

  test("dedup/similarity entry points leave no lingering CacheManager entries") {
    val cm = spark.sharedState.cacheManager
    val wasEmpty = cm.isEmpty
    Dedup.minhashDedup(docs, threshold = 0.5).count()
    Dedup.minhashDedupComponents(docs, threshold = 0.5).count()
    Similarity.cosineNearDupPairs(vectors, threshold = 0.5, dim = 32).count()
    // Every internal persist must be released before return (round-3 ADVICE:
    // caches must not accumulate across a long session).
    if (wasEmpty) assert(cm.isEmpty, "an entry point leaked a cached frame")
  }

  // ---- embeddings: LSH recall vs brute force ----

  private def vec(seed: Int, dim: Int = 32): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)(r.nextFloat() * 2 - 1)
  }
  private def jitter(v: Seq[Float], eps: Float, seed: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    v.map(x => x + (r.nextFloat() * 2 - 1) * eps)
  }

  private lazy val vectors = {
    val distinct = (0 until 40).map(i => (i.toLong, vec(i)))
    val planted = Seq(
      (500L, vec(1000)), (501L, jitter(vec(1000), 0.05f, 1)),
      (600L, vec(2000)), (601L, jitter(vec(2000), 0.05f, 2)))
    (distinct ++ planted).toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("cosineNearDupPairs recall: finds every exact pair at threshold 0.5") {
    val exact = Similarity.exactNearDupPairs(vectors, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupPairs(vectors, threshold = 0.5, dim = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(Set((500L, 501L), (600L, 601L)).subsetOf(exact))
    val recall = if (exact.isEmpty) 1.0 else lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall; missed ${exact -- lsh}")
    assert(lsh.subsetOf(exact)) // exact verify step: no false positives
  }

  test("lshTopK at full probe radius matches brute-force top-k") {
    val q = vec(1000)
    val brute = Similarity.bruteForceTopK(vectors, q, k = 5, excludeIds = Seq(500L))
      .select("vec_id").as[Long].collect().toSeq
    val lsh = Similarity.lshTopK(vectors.where(col("vec_id") =!= 500L), q, k = 5,
      dim = 32, nPlanes = 8, probeHamming = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(lsh == brute)
    // and the planted near-neighbor is the top hit
    assert(brute.head == 501L)
  }

  test("lshTopK at small probe radius retrieves the planted near-neighbor") {
    val q = vec(2000)
    val hits = Similarity.lshTopK(vectors.where(col("vec_id") =!= 600L), q, k = 3,
      dim = 32, nPlanes = 8, probeHamming = 1)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits.contains(601L))
  }

  // ---- embeddings: IVF recall vs brute force ----

  test("ivfTopK at full probe equals brute-force top-k") {
    val q = vec(1000)
    val brute = Similarity.bruteForceTopK(vectors, q, k = 5, excludeIds = Seq(500L))
      .select("vec_id").as[Long].collect().toSeq
    val ivf = Similarity.ivfTopK(vectors.where(col("vec_id") =!= 500L), q, k = 5,
      dim = 32, nCentroids = 8, nProbe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == brute)
  }

  test("ivfTopK at small nProbe retrieves the planted near-neighbor and prunes") {
    val q = vec(2000)
    val hits = Similarity.ivfTopK(vectors.where(col("vec_id") =!= 600L), q, k = 3,
      dim = 32, nCentroids = 8, nProbe = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(hits.contains(601L))
    // pruning is real: the probed cells hold fewer vectors than the corpus
    val cents = Similarity.ivfCentroids(vectors, dim = 32, nCentroids = 8)
    val cells = Similarity.withIvfCells(vectors, cents)
      .groupBy("ivf_cell").count().as[(Int, Long)].collect().toMap
    assert(cells.size > 1, "all vectors fell into one cell — no pruning possible")
  }

  test("int8 quantize/dequantize roundtrip: bounded error, near-1 cosine, zero-safe") {
    import graft.plans.VectorFunctions._
    val withZero = vectors.unionByName(
      Seq((900L, Seq.fill(32)(0.0f))).toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>")))
    val rt = withZero
      .withColumn("mx", vec_absmax(col("embedding")))
      .withColumn("deq", dequantize_i8(quantize_i8(col("embedding")), col("mx")))
      .select(col("vec_id"), col("mx"),
        cosine_f32(col("embedding"), col("deq")).as("cos"),
        expr("aggregate(zip_with(embedding, deq, (a, b) -> abs(a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, CAST(x AS DOUBLE)))").as("max_err"))
      .as[(Long, Double, Double, Double)].collect()
    rt.foreach { case (id, mx, cos, maxErr) =>
      // quantization step is mx/127; rounding error ≤ half a step
      assert(maxErr <= mx / 127.0 * 0.5 + 1e-6, s"vec $id max_err $maxErr > step/2")
      if (mx > 0) assert(cos > 0.999, s"vec $id cosine degraded to $cos")
      else assert(cos == 0.0)
    }
  }

  test("quantizedTopK ranks like the float scan (high overlap, planted hit on top)") {
    val q = vec(1000)
    val brute = Similarity.bruteForceTopK(vectors, q, k = 5, excludeIds = Seq(500L))
      .select("vec_id").as[Long].collect().toSet
    val quant = Similarity.quantizedTopK(vectors.where(col("vec_id") =!= 500L), q, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(quant.intersect(brute).size >= 4, s"overlap ${quant.intersect(brute)}")
    assert(quant.contains(501L)) // the planted near-neighbor survives quantization
  }

  test("ivf empty cells keep previous centroids (no NaN poisoning)") {
    // 3 tight clusters, 8 requested centroids → ≥5 cells go empty in Lloyd
    val tight = (0 until 30).map(i => (i.toLong, jitter(vec(3000 + i % 3), 0.01f, i)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val cents = Similarity.ivfCentroids(tight, dim = 32, nCentroids = 8, iters = 3)
    assert(cents.length == 8)
    assert(cents.forall(_.forall(f => !f.isNaN)))
  }

  test("spanDedup catches a MISALIGNED duplicated passage (overlap vs fixed chunks)") {
    // A 5-token passage copied into doc 2 at offset 3 — no stride-5 chunk of
    // doc 2 equals a chunk of doc 1 (the fixed-chunk X30 blind spot), but the
    // stride-1 window at pos 3 matches doc 1's window at pos 0 exactly.
    val passage = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"$passage tail1 tail2 tail3 tail4 tail5"),
      (2L, s"pre1 pre2 pre3 $passage post1 post2")).toDF("doc_id", "text")
    val sites = Dedup.spanDedup(docs, spanTokens = 5)
      .as[(Long, Long)].collect().toSet
    assert(sites.contains((2L, 3L)), s"misaligned copy not caught: $sites")
    // the fixed-chunk pass indeed misses it (nothing dropped): the overlap
    // is the point of X36
    val segDropped = Dedup.segmentDedup(docs, segTokens = 5)
      .agg(org.apache.spark.sql.functions.sum("n_dropped")).head().getLong(0)
    assert(segDropped == 0L, "fixed chunks unexpectedly caught the misaligned copy")
    // winner site (doc 1, pos 0) is never excised
    assert(!sites.contains((1L, 0L)))
  }

  test("routed pairs: byte-identical docs in different routes never pair; unrouted does") {
    val docs = Seq(
      (1L, "en", base1), (2L, "en", base1 + " tailtok"),   // same-route near-dups
      (3L, "de", base1),                                    // exact clone, other route
      (4L, "en", base2), (5L, "de", base2)                  // exact clones across routes
    ).toDF("doc_id", "lang", "text")
    val routed = Dedup.minhashVerifiedPairs(docs, verifyThreshold = 0.8,
      routeCols = Seq("lang"))
      .select("id_a", "id_b", "lang")
      .as[(Long, Long, String)].collect().toSet
    // within-route near-dup found, tagged with its route
    assert(routed.contains((1L, 2L, "en")), s"missed in-route pair: $routed")
    // the cross-route exact clones are structurally invisible to every
    // routed exchange — group window, hot cap, banded join
    assert(!routed.exists { case (a, b, _) =>
      Set((1L, 3L), (2L, 3L), (4L, 5L))(a -> b) }, s"cross-route leak: $routed")
    // differential: the UNROUTED operator on the same corpus pairs them
    val unrouted = Dedup.minhashVerifiedPairs(docs, verifyThreshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(unrouted.contains((1L, 3L)) && unrouted.contains((4L, 5L)),
      s"unrouted baseline lost the exact clones: $unrouted")
  }
}
