package graft

import org.apache.spark.sql.functions._

import graft.functions.Dedup

/**
 * X46 incremental near-dup dedup: a persisted MinHash band index probed by
 * new batches. Pins the correctness contract (planted cross-run near-dups
 * found exactly, fresh docs match nothing, survivors are the anti-join) and
 * the SCALE shape (the probe is one equi-join on (band, bucket) — no
 * cartesian/nested-loop anywhere, a zero-collision batch produces zero
 * candidates, identical-signature floods collapse to one index row per
 * band, and hot buckets are capped at BUILD time).
 */
class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base1 =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby today"
  private val base2 =
    "a completely different report about quarterly revenue growth in the northern sales region during winter months overall"

  /** Corpus: 30 distinct docs + two base docs that later batches near-dup. */
  private lazy val corpus = {
    val distinct = (0 until 30).map(i =>
      (i.toLong, s"document number $i talks about topic $i with unique words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    (distinct ++ Seq((100L, base1), (200L, base2))).toDF("doc_id", "text")
  }

  private def freshIndexDir(): String =
    java.nio.file.Files.createTempDirectory("graft-x46-spec").toString

  test("probe finds exactly the planted cross-run near-dups; fresh docs match nothing") {
    val idx = freshIndexDir()
    Dedup.writeNearDupIndex(corpus, idx, k = 64, bands = 32)
    val batch = Seq(
      (1100L, base1.replace("dog", "dog quietly")),     // near-dup of 100
      (1200L, base2.replace("overall", "generally")),   // near-dup of 200
      (1300L, "entirely fresh zzqa zzqb zzqc zzqd zzqe zzqf zzqg content here")
    ).toDF("doc_id", "text")
    val matches = Dedup.probeNearDupIndex(batch, idx, corpus,
      candidateThreshold = 0.2, verifyThreshold = 0.5)
      .select("id_new", "id_base").as[(Long, Long)].collect().toSet
    assert(matches === Set((1100L, 100L), (1200L, 200L)), s"got $matches")
    val survivors = Dedup.nearDupSurvivors(batch, idx, corpus, verifyThreshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(1300L))
  }

  test("probe equals the all-pairs exact-Jaccard truth on a planted mixed batch") {
    val idx = freshIndexDir()
    Dedup.writeNearDupIndex(corpus, idx, k = 64, bands = 32)
    // every corpus doc re-appears lightly edited + 10 fresh docs
    val batch = corpus.select((col("doc_id") + 1000L).as("doc_id"),
        concat(col("text"), lit(" tailtok")).as("text"))
      .unionByName((0 until 10).map(i =>
        (5000L + i, s"fresh fz${i}a fz${i}b fz${i}c fz${i}d fz${i}e")).toDF("doc_id", "text"))
    val got = Dedup.probeNearDupIndex(batch, idx, corpus, verifyThreshold = 0.6)
      .select("id_new", "id_base", "jaccard").as[(Long, Long, Double)].collect().toSet
    // all-pairs truth: exact trigram jaccard across batch × corpus
    val g = Dedup.ngramJaccardPairs(batch.unionByName(corpus), threshold = 0.6)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val truth = g.flatMap { case (a, b, j) =>
      // keep only (batch, corpus) pairs, normalized to (id_new, id_base)
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      if (lo <= 200L && hi >= 1000L) Some((hi, lo, j)) else None
    }.toSet
    assert(got === truth, s"probe != truth; extra=${got -- truth} missing=${truth -- got}")
  }

  test("zero-collision batch yields zero candidates and the probe join is equi, not cartesian") {
    val idx = freshIndexDir()
    Dedup.writeNearDupIndex(corpus, idx, k = 64, bands = 32)
    val fresh = (0 until 20).map(i =>
      (9000L + i, s"totally new qx${i}a qx${i}b qx${i}c qx${i}d qx${i}e qx${i}f")).toDF("doc_id", "text")
    val probe = Dedup.probeNearDupIndex(fresh, idx, corpus)
    assert(probe.count() === 0L)
    // Plan audit on the un-checkpointed pipeline: rebuild the candidate join
    // the probe runs and assert the (band, bucket) equi-join shape.
    graft.plans.SketchFunctions.register(spark)
    val idxBands = spark.read.parquet(s"$idx/bands")
    val newBanded = fresh.select(col("doc_id").as("_ra"),
      posexplode(graft.plans.SketchFunctions.minhash_bands(
        Dedup.minhashSignature(col("text"), 64, 3), 32)).as(Seq("band", "bucket")))
    val plan = newBanded.join(idxBands, Seq("band", "bucket"))
      .queryExecution.executedPlan.toString
    val prePlan = plan.split("== Initial Plan ==")(0)
    assert(!prePlan.contains("CartesianProduct") && !prePlan.contains("BroadcastNestedLoopJoin"),
      s"probe join degraded:\n$prePlan")
    assert(prePlan.contains("Join") || prePlan.contains("HashJoin"), s"no join found:\n$prePlan")
  }

  test("append grows the index without a rebuild: gen-2 probes match both generations") {
    val idx = freshIndexDir()
    Dedup.writeNearDupIndex(corpus, idx, k = 64, bands = 32)
    val gen1 = Seq(
      (2100L, "completely new ga gb gc gd ge gf gg gh gi gj material"),
      (2200L, "another new ha hb hc hd he hf hg hh hi hj chapter")).toDF("doc_id", "text")
    // gen1 is all-fresh: probe finds nothing, then the survivors append
    assert(Dedup.probeNearDupIndex(gen1, idx, corpus).count() === 0L)
    Dedup.appendNearDupIndex(gen1, idx, k = 64, bands = 32)
    val gen2 = Seq(
      (3100L, "completely new ga gb gc gd ge gf gg gh gi gj material extra"), // ~gen1 2100
      (3200L, base1.replace("today", "tonight"))                              // ~corpus 100
    ).toDF("doc_id", "text")
    val matches = Dedup.probeNearDupIndex(gen2, idx, corpus.unionByName(gen1),
      verifyThreshold = 0.5)
      .select("id_new", "id_base").as[(Long, Long)].collect().toSet
    assert(matches === Set((3100L, 2100L), (3200L, 100L)), s"got $matches")
    // append added exactly gen1's planes: 2 reps × 32 bands, 2 sigs, 2 members
    assert(spark.read.parquet(s"$idx/members").count() === corpus.count() + 2)
  }

  test("identical-signature flood collapses to one index row per band; hot buckets capped at build") {
    val idx = freshIndexDir()
    val flood = (0 until 500).map(i => (i.toLong, base1)).toDF("doc_id", "text")
    Dedup.writeNearDupIndex(flood, idx, k = 64, bands = 32, maxBucketSize = 10)
    val bands = spark.read.parquet(s"$idx/bands")
    // 500 identical docs → ONE rep → exactly 32 banding rows, none capped
    assert(bands.count() === 32L)
    assert(spark.read.parquet(s"$idx/members").count() === 500L)
    // probing with one more copy matches ALL 500 members via rep expansion
    val batch = Seq((8888L, base1)).toDF("doc_id", "text")
    val n = Dedup.probeNearDupIndex(batch, idx, flood, verifyThreshold = 0.9).count()
    assert(n === 500L)
  }
}
