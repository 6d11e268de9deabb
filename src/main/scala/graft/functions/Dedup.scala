package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.plans.SketchFunctions
import TextFunctions._

/**
 * Corpus deduplication at scale: exact, MinHash+LSH, SimHash, and exact
 * n-gram Jaccard. Sketch hot paths run native codegen'd expressions
 * (graft.plans.SketchExpressions) — one fused pass per row, no interpreted
 * higher-order functions, no driver-side loops.
 *
 * Shuffle discipline (the 100 TB concern):
 *  - exact dedup: one shuffle on the content hash;
 *  - MinHash LSH: signatures materialize ONCE (persisted), banding explodes
 *    only (id, band, bucket) — never the signature arrays; candidate pairs
 *    dedupe on ids alone, then re-join the tiny signature frame for the
 *    estimate. Hot buckets (degenerate corpora: thousands of near-empty docs
 *    sharing one bucket) are capped before the self-join goes quadratic.
 *  - SimHash: one shuffle on the 16-bit pigeonhole block key.
 */
object Dedup {

  /** Exact duplicate groups: hash of normalized content. One shuffle. */
  def withContentHash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("content_hash", contentFingerprint(col(textCol)))

  /** Exact dedup: keep the lowest id per identical normalized text. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    withContentHash(docs, textCol)
      .groupBy("content_hash")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Exact dedup, keeping the BEST document of each identical-content group
    * rather than the lowest id — the production dedup shape (near-identical
    * scrapes differ in surrounding quality signals; you keep the best copy).
    * `better` columns rank candidates (first column most significant); ties
    * MUST be broken deterministically by the caller including a unique column
    * (idCol is appended as the final ascending tiebreak automatically).
    * One shuffle (the window's hash partition on content_hash — same exchange
    * exactDedup's groupBy uses); emits one row per group: the surviving id +
    * group size. */
  def dedupKeepBest(docs: DataFrame, better: Seq[Column],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(better :+ col(idCol).asc: _*)
    withContentHash(docs, textCol)
      .withColumn("_rk", row_number().over(w))
      .withColumn("dup_count", count(lit(1)).over(Window.partitionBy(col("content_hash"))))
      .where(col("_rk") === 1)
      .drop("_rk")
  }

  /** Incremental (cross-run) exact dedup: rows of `newDocs` whose normalized
    * content hash does NOT already appear in `knownHashes` (a `content_hash`
    * plane from previous ingest runs — build one with [[withContentHash]]).
    * The daily-crawl shape at 100 TB: today's batch anti-joins yesterday's
    * accumulated hash plane instead of re-deduping the whole corpus. One
    * shuffle per side on the hash key (AQE broadcasts the known plane when a
    * backfill makes it the small side); the hash plane is 32 bytes/doc —
    * 3 TB per 100G docs — so the anti-join never touches document payloads. */
  def dedupAgainstKnown(newDocs: DataFrame, knownHashes: DataFrame,
      textCol: String = "text"): DataFrame =
    withContentHash(newDocs, textCol)
      .join(knownHashes.select(col("content_hash")).distinct(),
        Seq("content_hash"), "left_anti")

  /**
   * [[dedupAgainstKnown]] for the regime where the accumulated hash plane is
   * too big to broadcast AND the anti-join shuffle of today's batch is the
   * cost to kill: collapse the known plane to a Bloom filter (~1.2 bytes/hash
   * at 1% fpp — 100G known docs ≈ 120 GB of md5s but only ~14 GB of bloom;
   * 1G ≈ 1.4 GB, a routine broadcast) and probe it executor-side. Bloom
   * filters have NO false negatives, so bloom-negative rows — the
   * overwhelming majority of a mostly-novel batch — are provably absent from
   * the known corpus and pass through with ZERO shuffle and zero contact
   * with the known table. Only bloom-POSITIVE rows (true dupes + the fpp
   * sliver) do the exact confirm anti-join, so the shuffled volume drops
   * from |batch| to |dupes|/(1−fpp) — and the result is still EXACTLY
   * `new ∖ known`, because the confirm join kills every false positive.
   *
   * The membership probe is a broadcast-backed Scala UDF — deliberately:
   * the bloom sidecar must ship via TorrentBroadcast (embedding it in the
   * plan as an Expression literal would serialize it per-stage), and the
   * single hash probe per row is trivia next to the codegen'd md5 feeding
   * it. The batch IS scanned twice (once per branch of the union); at scale
   * that is two cheap columnar scans bought for one expensive shuffle.
   */
  def bloomDedupAgainstKnown(newDocs: DataFrame, knownHashes: DataFrame,
      textCol: String = "text", fpp: Double = 0.01,
      expectedItems: Option[Long] = None): DataFrame = {
    val known = knownHashes.select(col("content_hash")).distinct()
    val expected = math.max(expectedItems.getOrElse(known.count()), 1L)
    val bloom = known.stat.bloomFilter("content_hash", expected, fpp)
    val bc = newDocs.sparkSession.sparkContext.broadcast(bloom)
    val maybeKnown = udf((h: String) => bc.value.mightContainString(h))
    val hashed = withContentHash(newDocs, textCol)
    hashed.where(!maybeKnown(col("content_hash")))
      .unionByName(
        hashed.where(maybeKnown(col("content_hash")))
          .join(known, Seq("content_hash"), "left_anti"))
  }

  /**
   * MinHash signature: k independent min-hashes over word-`n`-gram shingles,
   * computed by the native MinHashSignature expression (one string hash per
   * gram + k integer hashes, fused loop inside WholeStageCodegen). Returns an
   * array<bigint> column of length k. Requires SketchFunctions.register on
   * the session (the pair/dedup entry points below do it).
   */
  def minhashSignature(text: Column, k: Int = 64, shingleN: Int = 3): Column = {
    val grams = wordNgrams(text, shingleN)
    // Zero-gram docs (fewer than n tokens) sign the empty string so they
    // still bucket together — they ARE trivial near-dups of each other.
    val nonEmpty = when(size(grams) === 0, array(lit(""))).otherwise(grams)
    SketchFunctions.minhash_sig(nonEmpty, k)
  }

  /**
   * MinHash+LSH candidate pairs: band the k-signature into `bands` bands,
   * bucket on the band hash, pair up within buckets. Estimated Jaccard =
   * fraction of agreeing signature positions; pairs ≥ `threshold` survive.
   *
   * Exact-signature collapse (flood safety): identical signatures are
   * near-dups by construction (est_jaccard = 1 ≥ any threshold), so each
   * identical-signature group collapses to its min-id representative BEFORE
   * banding — the group contributes |group|−1 star pairs (rep, member) plus
   * ONE banding row. A flood of N identical docs therefore costs O(N), never
   * a quadratic bucket, and the `maxBucketSize` cap only ever drops buckets
   * of genuinely DISTINCT signatures (a hash pile-up) — never the duplicate
   * floods dedup exists to catch. The pair set is transitive-closure-
   * equivalent to the exhaustive one (stars instead of cliques within an
   * identical-signature group), which is exactly what dedup/components
   * consume.
   *
   * Scale shape: signatures materialize once (persisted); banding explodes
   * (id, band, bucket) — 3 narrow columns; candidates dedupe on ids only;
   * signatures re-join for the estimate. No all-pairs product ever
   * materializes. The returned pair frame is materialized (it is the output)
   * and the signature cache is released before returning — caches must not
   * accumulate across long sessions.
   */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      threshold: Double = 0.7,
      maxBucketSize: Int = 1000): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    SketchFunctions.register(docs.sparkSession)

    val signed = signatures(docs, idCol, textCol, k, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (members, reps) = sigGroups(signed)
    // Non-representatives pair with their rep directly (est = 1.0).
    val intraPairs = members.where(col("id") =!= col("rep"))
      .select(col("rep").as("id_a"), col("id").as("id_b"), lit(1.0).as("est_jaccard"))
    val candidates = bandedCandidates(reps, bands, maxBucketSize)

    val repPairs = candidates
      .join(signed.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(signed.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard", SketchFunctions.sig_agreement(col("sig_a"), col("sig_b")))
      .where(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))

    // Eager localCheckpoint (not persist+count): the returned frame is
    // materialized and lineage-free, but holds NO CacheManager entry — its
    // blocks are freed by the ContextCleaner when the frame is dropped, so
    // repeated calls in a long session cannot accumulate caches (round-3
    // ADVICE). Trade-off: localCheckpoint blocks don't survive executor loss;
    // a job that must survive churn mid-consumption should write the (small)
    // pair output to storage instead.
    val result = repPairs.unionByName(intraPairs).localCheckpoint(true)
    signed.unpersist()
    result
  }

  /** (id[, route...], sig) plane — one fused native pass per row. Caller
    * persists. `routeCols` (X94) carry the partition-routing keys every
    * downstream exchange must include. */
  private[graft] def signatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int, shingleN: Int, routeCols: Seq[String] = Nil): DataFrame =
    docs.select(col(idCol).as("id") +: routeCols.map(col) :+
      minhashSignature(col(textCol), k, shingleN).as("sig"): _*)

  /** Identical-signature grouping (one shuffle on the signature):
    * membership plane (id, rep) with rep = min id of the group, and the
    * rep (id[, route...], sig) plane that feeds banding — a flood of N
    * identical docs contributes ONE banding row, never a quadratic bucket.
    * With `routeCols` the group key is (route..., sig): byte-identical
    * docs in different routes stay separate groups by construction. */
  private[graft] def sigGroups(signed: DataFrame,
      routeCols: Seq[String] = Nil): (DataFrame, DataFrame) = {
    val withRep = signed.withColumn("rep", min(col("id"))
      .over(Window.partitionBy(routeCols.map(col) :+ col("sig"): _*)))
    (withRep.select(col("id"), col("rep")),
      withRep.where(col("id") === col("rep"))
        .select(col("id") +: routeCols.map(col) :+ col("sig"): _*))
  }

  /** Rep-level banded candidate pairs with the hot-bucket cap.
    *
    * Hot-bucket cap as partial-agg → tiny hot set → BROADCAST anti-join:
    * a window count would sort and shuffle the entire banded plane just to
    * find the few over-cap keys; map-side combine makes the hot-set
    * aggregation cheap, and the anti-join stays map-side (banded itself is
    * a projection off the signature cache — never shuffled here). The hot
    * set is ≤ |banded| / maxBucketSize keys by construction: broadcastable.
    * Because identical signatures collapsed to reps upstream, the cap only
    * ever drops buckets of genuinely DISTINCT signatures (a hash pile-up) —
    * never the duplicate floods dedup exists to catch. */
  private def bandedCandidates(reps: DataFrame, bands: Int, maxBucketSize: Int,
      routeCols: Seq[String] = Nil): DataFrame = {
    val banded = reps.select(col("id") +: routeCols.map(col) :+
      posexplode(SketchFunctions.minhash_bands(col("sig"), bands)).as(Seq("band", "bucket")): _*)
    val bucketKey = routeCols ++ Seq("band", "bucket")
    val hot = banded.groupBy(bucketKey.map(col): _*).agg(count(lit(1)).as("_bsz"))
      .where(col("_bsz") > maxBucketSize).select(bucketKey.map(col): _*)
    val capped = banded.join(broadcast(hot), bucketKey, "left_anti")
    val l = capped.select(bucketKey.map(col) :+ col("id").as("id_a"): _*)
    val r = capped.select(bucketKey.map(col) :+ col("id").as("id_b"): _*)
    l.join(r, bucketKey)
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
  }

  /**
   * MinHash-LSH candidates verified by EXACT n-gram Jaccard — the production
   * sketch shape: the sketch supplies recall without an all-pairs product,
   * the exact re-verify supplies precision, and reported `jaccard` values are
   * exact (not signature estimates), so results are oracle-comparable.
   *
   * `candidateThreshold` gates on the signature estimate (keep it LOW — it
   * exists to drop obvious noise, and a tight gate would reject true pairs
   * whose 64-position estimate wobbles under the verify bar);
   * `verifyThreshold` is the real similarity bar, enforced exactly.
   *
   * Recall at scale: a pair at true Jaccard s survives banding with
   * p = 1 − (1 − s^r)^bands (r = k/bands); at the defaults (r=2, 32 bands)
   * a pair AT the 0.8 bar is missed with p ≈ (1 − 0.64)^32 ≈ 6e-15 —
   * structurally negligible, which is what lets a planted-truth oracle
   * demand exact equality against the all-pairs ground truth.
   */
  def minhashVerifiedPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 64,
      bands: Int = 32,
      shingleN: Int = 3,
      candidateThreshold: Double = 0.2,
      verifyThreshold: Double = 0.8,
      maxBucketSize: Int = 1000,
      routeCols: Seq[String] = Nil): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    SketchFunctions.register(docs.sparkSession)
    val signed = signatures(docs, idCol, textCol, k, shingleN, routeCols)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (members0, reps) = sigGroups(signed, routeCols)
    val members = members0.persist(StorageLevel.MEMORY_AND_DISK)

    // Rep-level candidates, gated on the signature estimate while pairs are
    // still one-per-signature-group (members share the rep's signature
    // EXACTLY, so the gate generalizes to every expanded member pair).
    val repCands0 = bandedCandidates(reps, bands, maxBucketSize, routeCols)
    val repCands =
      if (candidateThreshold <= 0) repCands0
      else repCands0
        .join(signed.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(signed.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .where(SketchFunctions.sig_agreement(col("sig_a"), col("sig_b")) >= candidateThreshold)
        .select("id_a", "id_b")

    // PAIRWISE CLOSURE — the difference from minhashPairs' star form: this
    // operator's contract is the full pairwise set, so identical-signature
    // groups expand back to member level (every cross-group member pair,
    // plus the within-group clique via the group's self-candidacy). The
    // expansion is quadratic exactly where the ground truth is quadratic —
    // a group of m identical docs genuinely HAS m(m-1)/2 pairs — while the
    // banding work stays one row per group.
    val groupSelf = members.groupBy("rep").agg(count(lit(1)).as("_m")).where(col("_m") > 1)
      .select(col("rep").as("id_a"), col("rep").as("id_b"))
    val cands = repCands.unionByName(groupSelf)
      .join(members.select(col("rep").as("id_a"), col("id").as("_ma")), Seq("id_a"))
      .join(members.select(col("rep").as("id_b"), col("id").as("_mb")), Seq("id_b"))
      .select(least(col("_ma"), col("_mb")).as("id_a"), greatest(col("_ma"), col("_mb")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")

    // Gram sets materialize once; both verify joins read the cache. Docs with
    // fewer than shingleN tokens have no grams and drop out of the verify —
    // the sentinel-signature pairs the banding admits for them are trivial
    // (empty-ish docs), not similarity evidence.
    val shingled = docs
      .select(col(idCol).as("id"), array_distinct(wordNgrams(col(textCol), shingleN)).as("grams"))
      .where(size(col("grams")) > 0)
      .withColumn("n_grams", size(col("grams")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verified = cands
      .join(shingled.select(col("id").as("id_a"), col("grams").as("ga"), col("n_grams").as("na")), Seq("id_a"))
      .join(shingled.select(col("id").as("id_b"), col("grams").as("gb"), col("n_grams").as("nb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= verifyThreshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    // Route columns ride back onto the (small) verified pair frame from the
    // signature cache — pairs are within-route by construction, so id_a's
    // route is the pair's route.
    val result = (if (routeCols.isEmpty) verified
      else verified.join(
        signed.select(col("id").as("id_a") +: routeCols.map(col): _*), Seq("id_a")))
      .localCheckpoint(true)
    shingled.unpersist()
    members.unpersist()
    signed.unpersist()
    result
  }

  /** MinHash dedup: survivors = docs minus the higher-id member of every
    * near-dup pair (connected via the pair set's right side). Pairwise form —
    * for transitive chains (A≈B≈C with A≉C) prefer [[minhashDedupComponents]],
    * which keeps exactly one doc per connected component. */
  def minhashDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.7): DataFrame = {
    val doomed = minhashPairs(docs, idCol, textCol, threshold = threshold)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(doomed, Seq(idCol), "left_anti")
  }

  /**
   * Connected components over a near-dup pair set (`id_a`, `id_b`): returns
   * (id, component) where component = the minimum id reachable through the
   * pair graph. Each round does (a) min-label propagation — every node takes
   * the minimum of its own and its neighbors' labels (one join + one
   * aggregation over the EDGE set, never an all-pairs product) — then (b) a
   * POINTER-JUMP shortcut: a label is itself a node id, so each node
   * re-reads the label OF its label (one node-sized self-join). Propagation
   * alone moves a label one hop per round (O(diameter) — a scale hazard on
   * long transitive near-dup chains); with the jump the reach doubles each
   * round, so convergence is O(log diameter). Labels are monotone
   * non-increasing and always some reachable node's id, and the minimum node
   * of a component keeps its own label — so the no-change fixpoint is
   * exactly "constant = component minimum". `maxIters` is a safety bound;
   * the per-round convergence `count()` is the standard driver-side fixpoint
   * check of iterative label propagation (same shape at 1000 executors).
   */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // Every round references the previous labels frame more than once, so
      // an UN-truncated lineage would double in size per round (exponential
      // logical plans, analyzer OOM by round ~20). Eager localCheckpoint
      // truncates: each round's plan reads materialized blocks, plans stay
      // constant-size, and the loop caches exactly one generation at a time.
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id"))
        .localCheckpoint(true)
      var it = 0
      var converged = false
      while (!converged && it < maxIters) {
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("component")), Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(min(col("component")).as("nbr"))
        val stepped = labels.select(col("id"), col("component").as("prev"))
          .join(nbrMin, Seq("id"), "left_outer")
          .select(col("id"), col("prev"),
            least(col("prev"), coalesce(col("nbr"), col("prev"))).as("c1"))
          .localCheckpoint(true)
        // pointer jump: c1 is a node id; that node's own c1 is ≤ c1 (labels
        // are monotone and ≤ own id), so looking it up can only shortcut
        val next = stepped
          .join(stepped.select(col("id").as("c1"), col("c1").as("jump")), Seq("c1"), "left_outer")
          .select(col("id"),
            least(col("c1"), coalesce(col("jump"), col("c1"))).as("component"),
            (coalesce(col("jump"), col("c1")) < col("prev") || col("c1") < col("prev")).as("_changed"))
          .localCheckpoint(true)
        converged = next.where(col("_changed")).limit(1).count() == 0L
        labels = next // checkpointed; _changed projected away on return
        it += 1
      }
      labels.select(col("id"), col("component"))
    } finally edges.unpersist()
  }

  /** MinHash dedup keeping exactly ONE doc (the minimum id) per connected
    * near-dup component — the transitive-closure upgrade of [[minhashDedup]]. */
  def minhashDedupComponents(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.7): DataFrame = {
    val comps = connectedComponents(
      minhashPairs(docs, idCol, textCol, threshold = threshold))
    val doomed = comps.where(col("id") =!= col("component")).select(col("id").as(idCol))
    docs.join(doomed, Seq(idCol), "left_anti")
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 64-bit SimHash fingerprint: per bit position, majority vote over token
    * hashes — native SimHash64 expression, one pass per row. */
  def simhashColumn(text: Column): Column = SketchFunctions.simhash64(tokens(text))

  /**
   * SimHash near-dup pairs within Hamming distance `maxHamming`: block on the
   * four 16-bit sub-fingerprints (pigeonhole: any pair with ≤ 3 differing
   * bits out of 64 agrees exactly on at least one of the 4 blocks), then
   * verify exact Hamming inside each block-bucket. One shuffle on the block
   * key — never an all-pairs product. `maxBucketSize` caps degenerate blocks
   * (identical fingerprints en masse) like minhashPairs.
   */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    SketchFunctions.register(docs.sparkSession)
    fingerprintPairs(
      docs.select(col(idCol).as("id"), simhashColumn(col(textCol)).as("sh")),
      maxHamming, maxBucketSize)
  }

  /**
   * Near-dup pairs over ANY 64-bit fingerprint column (`id`, `sh`) — the
   * shared engine behind text SimHash and multimodal perceptual hashes.
   * 4-block pigeonhole blocking + exact Hamming verify, as documented on
   * simhashPairs.
   */
  def fingerprintPairs(hashed: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole blocking is exact only for maxHamming <= 3")
    // The fingerprint computation (simhash/phash per row) materializes ONCE:
    // the hot-set aggregation and both self-join sides read the cache instead
    // of re-hashing the corpus per consumer. Released before return; the
    // (small) pair output comes back pinned and lineage-free — the same cache
    // discipline as minhashPairs.
    val blocked = hashed.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b => struct(lit(b).as("blk"),
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("blkval"))): _*)).as("x"))
      .select(col("id"), col("sh"), col("x.blk"), col("x.blkval"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Cap as partial-agg → tiny hot set → BROADCAST anti-join: no sort-window
    // shuffle of the blocked plane (the hot set is ≤ rows/cap keys).
    val hot = blocked.groupBy("blk", "blkval").agg(count(lit(1)).as("_bsz"))
      .where(col("_bsz") > maxBucketSize).select("blk", "blkval")
    val capped = blocked.join(broadcast(hot), Seq("blk", "blkval"), "left_anti")
    val l = capped.select(col("blk"), col("blkval"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = capped.select(col("blk"), col("blkval"), col("id").as("id_b"), col("sh").as("sh_b"))
    val result = l.join(r, Seq("blk", "blkval"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint(true)
    blocked.unpersist()
    result
  }

  /**
   * Exact n-gram Jaccard similarity pairs ≥ `threshold`, computed without an
   * all-pairs product: explode distinct shingles, join docs sharing a shingle
   * (any pair with Jaccard > 0 shares ≥ 1 shingle, so this blocking is
   * EXACT), count shared shingles per pair, then |A∩B| / (|A|+|B|−|A∩B|).
   * Shuffles: one on shingle, one on the pair key.
   *
   * `maxDocsPerShingle` is the skew discipline for 100 TB corpora, ON by
   * default (Some(1000), mirroring minhashPairs' maxBucketSize): shingles
   * shared by more than that many docs are dropped from CANDIDATE GENERATION
   * (a shingle like "in the the" can otherwise explode quadratically), and
   * the Jaccard of surviving candidates is recomputed exactly from the full
   * gram sets — so reported values stay exact; only pairs whose EVERY common
   * shingle is hot can be missed (at cap 1000 such a pair shares only
   * corpus-stopword shingles — noise by construction). Pass None for the
   * fully exact single-pass plan on corpora known to be skew-free.
   */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.5,
      maxDocsPerShingle: Option[Int] = Some(1000)): DataFrame = {
    SketchFunctions.register(docs.sparkSession)
    val shingled = docs
      .select(col(idCol).as("id"), array_distinct(wordNgrams(col(textCol), n)).as("grams"))
      .where(size(col("grams")) > 0)
      .withColumn("n_grams", size(col("grams")))

    val exploded = shingled.select(col("id"), col("n_grams"), explode(col("grams")).as("g"))

    maxDocsPerShingle match {
      case None =>
        val l = exploded.select(col("g"), col("id").as("id_a"), col("n_grams").as("na"))
        val r = exploded.select(col("g"), col("id").as("id_b"), col("n_grams").as("nb"))
        l.join(r, Seq("g"))
          .where(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b", "na", "nb")
          .agg(count(lit(1)).as("inter"))
          .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
          .where(col("jaccard") >= threshold)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))

      case Some(cap) =>
        // Cold shingles only for candidate generation; exact verify after.
        // The gram sets materialize ONCE (the shingling pass is the per-row
        // cost): the hot-set aggregation, both candidate sides, and the two
        // re-verify joins all read the cache. Hot shingles drop via map-side
        // agg + BROADCAST anti-join (the same cap shape as the sketch
        // pair-finders) — the former per-shingle window sort-shuffled the
        // whole exploded plane; the hot set is ≤ rows/cap keys. The cache is
        // released before return; the (small) pair output comes back pinned
        // and lineage-free, as in minhashPairs.
        shingled.persist(StorageLevel.MEMORY_AND_DISK)
        val hot = exploded.groupBy("g").agg(count(lit(1)).as("_df"))
          .where(col("_df") > cap).select("g")
        val cold = exploded.join(broadcast(hot), Seq("g"), "left_anti")
          .select(col("g"), col("id"))
        val l = cold.select(col("g"), col("id").as("id_a"))
        val r = cold.select(col("g"), col("id").as("id_b"))
        val candidates = l.join(r, Seq("g"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
          .dropDuplicates("id_a", "id_b")
        val result = candidates
          .join(shingled.select(col("id").as("id_a"), col("grams").as("ga"), col("n_grams").as("na")), Seq("id_a"))
          .join(shingled.select(col("id").as("id_b"), col("grams").as("gb"), col("n_grams").as("nb")), Seq("id_b"))
          .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
          .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
          .where(col("jaccard") >= threshold)
          .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
          .localCheckpoint(true)
        shingled.unpersist()
        result
    }
  }

  /**
   * Benchmark decontamination report: for every training document sharing at
   * least one word-`n`-gram with the evaluation set, the number of distinct
   * grams shared — the standard pre-training hygiene pass (strip eval/test
   * material from the corpus before it leaks into training).
   *
   * Shuffle shape for 100 TB: an eval set is tiny (megabytes of benchmark
   * text) next to the corpus, so its distinct grams BROADCAST; corpus
   * shingles stream through the broadcast hash join with no shuffle of the
   * corpus plane at all. The only exchange is the per-doc count, keyed on the
   * id with map-side partial aggregation. Both sides shingle with the native
   * codegen'd word_ngrams — one fused pass per row.
   */
  def contaminationReport(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    SketchFunctions.register(docs.sparkSession)
    val evalGrams = evalDocs
      .select(explode(array_distinct(wordNgrams(col(textCol), n))).as("_gram"))
      .distinct()
    docs
      .select(col(idCol), explode(array_distinct(wordNgrams(col(textCol), n))).as("_gram"))
      .join(broadcast(evalGrams), Seq("_gram"))
      // grams are distinct within a doc, so plain count = distinct shared
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The corpus with contaminated documents removed: docs that share NO
    * word-`n`-gram with the eval set. Same broadcast shape as
    * [[contaminationReport]]; the anti side is the (small) contaminated-id
    * frame, so the final filter is a broadcastable left-anti join. */
  def decontaminate(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.join(
      contaminationReport(docs, evalDocs, n, idCol, textCol).select(col(idCol)),
      Seq(idCol), "left_anti")

  /**
   * Sorted-neighborhood near-dup pairs — the third candidate-generation
   * family next to sketch banding and shingle blocking: impose a GLOBAL
   * total order on a normalized sort key (whitespace-collapsed lowercase
   * text, ties by id), take every pair within `window` positions as a
   * candidate, verify to exact n-gram Jaccard ≥ `threshold`. Classic entity
   * resolution: near-duplicates that share a PREFIX sort adjacent, so a
   * sliding window finds them with O(rows × window) candidates regardless
   * of how hot any blocking key would have been.
   *
   * The global contiguous index comes from `zipWithIndex` over the sorted
   * plane — the one legitimate RDD drop in this file: a DataFrame window
   * would single-partition the corpus, `monotonically_increasing_id` is not
   * contiguous, while zipWithIndex is one count-per-partition job plus
   * per-partition offsets (range-partitioned sort stays distributed).
   * Candidate pairing is then a banded equi-join on index blocks (each pos
   * joins block b and b+1 — same shape as the time-proximity join), never a
   * cross product; the verify recomputes Jaccard from the full gram sets.
   */
  def sortedNeighborPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      window: Int = 3,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(window >= 1, s"window $window")
    val spark = docs.sparkSession
    val keyed = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .withColumn("sk", regexp_replace(trim(lower(col("text"))), "\\s+", " "))
    val sorted = keyed.orderBy(col("sk"), col("id")).select("id", "text")
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) => org.apache.spark.sql.Row(r.get(0), i) },
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType)
        .add("pos", org.apache.spark.sql.types.LongType))
    // banded index join: pos_b - pos_a in [1, window] pairs live in the same
    // or adjacent window-sized block
    val blocked = indexed.withColumn("blk", col("pos") / window cast "long")
    val left = blocked.select(col("id").as("id_l"), col("pos").as("pos_a"), col("blk"))
    def right(shift: Int) = blocked.select(col("id").as("id_r"), col("pos").as("pos_b"),
      (col("blk") - shift).as("blk"))
    val cands = left.join(right(0).unionByName(right(1)), Seq("blk"))
      .where((col("pos_b") - col("pos_a")).between(1, window))
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"))
    val grams = keyed
      .select(col("id"), array_distinct(wordNgrams(col("text"), n)).as("grams"))
      .where(size(col("grams")) > 0)
      .withColumn("ng", size(col("grams")))
    cands
      .join(grams.select(col("id").as("id_a"), col("grams").as("ga"), col("ng").as("na")), Seq("id_a"))
      .join(grams.select(col("id").as("id_b"), col("grams").as("gb"), col("ng").as("nb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /**
   * X56: prefix-filtering set-similarity join (the PPJoin/AllPairs family —
   * Chaudhuri et al. SSJoin 2006, Xiao et al. PPJoin 2008) — all pairs with
   * word-`n`-gram-set Jaccard ≥ `threshold`, the FOURTH candidate-generation
   * family next to sketch banding (X2), shingle blocking (X4), and sorted
   * neighborhoods (X4b). Where X4 explodes EVERY shingle of every doc into
   * the candidate join, prefix filtering explodes only each doc's PREFIX
   * under a global rarest-first element order, with GUARANTEED recall:
   * order set elements by (document frequency asc, element asc); a doc
   * with m distinct elements keeps its first p = m − ⌈τ·m⌉ + 1. If
   * J(a,b) ≥ τ then |a∩b| ≥ τ·max(|a|,|b|), and a shared element set that
   * avoided a's prefix entirely would fit inside a's suffix of length
   * ⌈τ·|a|⌉ − 1 < τ·|a| ≤ |a∩b| — contradiction; so every qualifying pair
   * shares a PREFIX element and falls out of a plain hash equi-join on the
   * prefix plane. At τ=0.6 only ~40% of each set is prefix, and it is the
   * RAREST 40% — the df-ascending order sends corpus-stopword elements to
   * suffixes, so candidate buckets stay small exactly where plain blocking
   * goes hot. A length gate (τ·|a| ≤ |b| ≤ |a|/τ is necessary for J ≥ τ)
   * prunes candidates in the join condition; survivors re-verify EXACTLY
   * from the full sets, so reported Jaccard values are exact and the
   * prefix filter affects nothing but which pairs are examined.
   *
   * The set universe is word `n`-grams (default 3): on corpora with a
   * shared topical vocabulary, UNIGRAM sets are so undiscriminative that
   * the similarity graph itself is quadratic (measured on the sf0.1
   * fixture: 623k unigram pairs at τ=0.6 vs 350 trigram pairs over the
   * same 2.5k docs) — no candidate algorithm fixes an output that big,
   * and every near-dup definition in this file shingles for the same
   * reason. Pass n = 1 deliberately for genuinely set-valued data
   * (tags, SKU baskets).
   *
   * 100 TB shape: the df table is one element-keyed aggregation
   * (vocabulary-sized, Heaps'-law sublinear in the corpus); rank
   * assignment is an equi-join of the element plane against it (AQE
   * broadcasts it when small, shuffles otherwise — never a driver
   * collect); the per-doc re-sort is one groupBy(id) fold; the candidate
   * join shuffles only prefix elements. `maxDocsPerPrefixToken` is the
   * familiar flood cap: a prefix bucket larger than the cap (degenerate
   * corpora where even rare elements flood) leaves candidate generation
   * before the self-join goes quadratic.
   */
  def ppjoinPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.6,
      maxDocsPerPrefixToken: Option[Int] = Some(1000),
      docFreq: Option[DataFrame] = None): DataFrame = {
    SketchFunctions.register(docs.sparkSession)
    val toks = docs
      .select(col(idCol).cast("long").as("id"),
        array_distinct(wordNgrams(col(textCol), n)).as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn("n_toks", size(col("toks")))
    toks.persist(StorageLevel.MEMORY_AND_DISK)
    val flat = toks.select(col("id"), col("n_toks"), explode(col("toks")).as("tok"))
    // global rarest-first total order: (df asc, token asc). Any total order
    // preserves the recall proof; this one minimizes prefix-bucket sizes.
    // A shared plane (TextFunctions.corpusDocFreq at the SAME n, X65) can be
    // passed in so a multi-operator pipeline tokenizes the corpus once.
    val dfreq = docFreq.getOrElse(flat.groupBy("tok").agg(count(lit(1)).as("df")))
    // per-doc prefix of length n − ⌈τn⌉ + 1 under that order. The ceil runs
    // with a 1e-9 guard so a float-down τ·n at an integer boundary can only
    // LENGTHEN the prefix (recall-safe; one extra candidate token at worst).
    val prefixLen = (col("n_toks") -
      ceil(lit(threshold) * col("n_toks") - lit(1e-9)).cast("int") + 1)
    val prefixed = flat.join(dfreq, Seq("tok"))
      .groupBy("id", "n_toks")
      .agg(slice(sort_array(collect_list(struct(col("df"), col("tok")))),
        lit(1), prefixLen).as("pref"))
      .select(col("id"), col("n_toks"), explode(col("pref.tok")).as("tok"))
    val capped = maxDocsPerPrefixToken match {
      case None => prefixed
      case Some(cap) =>
        val hot = prefixed.groupBy("tok").agg(count(lit(1)).as("_df"))
          .where(col("_df") > cap).select("tok")
        prefixed.join(broadcast(hot), Seq("tok"), "left_anti")
    }
    val l = capped.select(col("tok"), col("id").as("id_a"), col("n_toks").as("na"))
    val r = capped.select(col("tok"), col("id").as("id_b"), col("n_toks").as("nb"))
    val candidates = l.join(r, Seq("tok"))
      .where(col("id_a") < col("id_b") &&
        col("nb") >= lit(threshold) * col("na") &&
        col("na") >= lit(threshold) * col("nb"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    val result = candidates
      .join(toks.select(col("id").as("id_a"), col("toks").as("ta"), col("n_toks").as("na")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("toks").as("tb"), col("n_toks").as("nb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .localCheckpoint(true)
    toks.unpersist()
    result
  }

  /**
   * X57: exact n-gram CONTAINMENT pairs — the asymmetric near-dup shape
   * Jaccard structurally misses: a short document embedded verbatim inside
   * a much longer one (a quoted article, a scraped page wrapping a press
   * release, a chapter inside an anthology) has containment
   * C(A,B) = |A∩B| / min(|A|,|B|) ≈ 1 while J(A,B) = |A∩B| / |A∪B| is
   * arbitrarily small — no Jaccard threshold catches it without drowning
   * in false pairs. Reports (id_small, id_big, containment, jaccard) for
   * containment ≥ `threshold`, smaller gram-set first (ties by id), so a
   * cleaning pass can excise the contained copy.
   *
   * Same EXACT blocking as [[ngramJaccardPairs]] — any pair with
   * containment > 0 shares ≥ 1 shingle — with the same hot-shingle cap
   * discipline, and the same one-materialization contract: gram sets
   * persist once; candidate generation, the hot-set aggregation and the
   * verify joins all read the cache. 100 TB shape is identical to X4's:
   * one shingle-keyed shuffle, one pair-keyed dedup, verify carries only
   * candidate ids back to the gram frame.
   */
  def containmentPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.9,
      maxDocsPerShingle: Option[Int] = Some(1000)): DataFrame = {
    SketchFunctions.register(docs.sparkSession)
    val shingled = docs
      .select(col(idCol).cast("long").as("id"),
        array_distinct(wordNgrams(col(textCol), n)).as("grams"))
      .where(size(col("grams")) > 0)
      .withColumn("n_grams", size(col("grams")))
    shingled.persist(StorageLevel.MEMORY_AND_DISK)
    val exploded = shingled.select(col("id"), explode(col("grams")).as("g"))
    val cold = maxDocsPerShingle match {
      case None => exploded
      case Some(cap) =>
        val hot = exploded.groupBy("g").agg(count(lit(1)).as("_df"))
          .where(col("_df") > cap).select("g")
        exploded.join(broadcast(hot), Seq("g"), "left_anti")
    }
    val candidates = cold.select(col("g"), col("id").as("id_x"))
      .join(cold.select(col("g"), col("id").as("id_y")), Seq("g"))
      .where(col("id_x") < col("id_y"))
      .select("id_x", "id_y")
      .dropDuplicates("id_x", "id_y")
    val verified = candidates
      .join(shingled.select(col("id").as("id_x"), col("grams").as("gx"), col("n_grams").as("nx")), Seq("id_x"))
      .join(shingled.select(col("id").as("id_y"), col("grams").as("gy"), col("n_grams").as("ny")), Seq("id_y"))
      .withColumn("inter", size(array_intersect(col("gx"), col("gy"))))
      .withColumn("containment", col("inter") / least(col("nx"), col("ny")))
      .where(col("containment") >= threshold)
      // smaller gram set first; equal sizes break by id (id_x < id_y already)
      .select(
        when(col("nx") <= col("ny"), col("id_x")).otherwise(col("id_y")).as("id_small"),
        when(col("nx") <= col("ny"), col("id_y")).otherwise(col("id_x")).as("id_big"),
        round(col("containment"), 6).as("containment"),
        round(col("inter") / (col("nx") + col("ny") - col("inter")), 6).as("jaccard"))
      .localCheckpoint(true)
    shingled.unpersist()
    verified
  }

  /**
   * X58: graded contamination scoring — [[contaminationReport]] upgraded
   * from a membership report to the per-document SCORE a filtering policy
   * actually thresholds on (the standard n-gram-overlap contamination
   * metric: what fraction of THIS document's distinct n-grams appear
   * anywhere in the eval set). Reports EVERY training document —
   * (doc_id, n_grams, n_shared, score = n_shared/n_grams, contaminated) —
   * so downstream policy can sweep the threshold without recomputation;
   * `flagAt` marks the conventional cut. Zero-overlap docs cost nothing
   * extra: the broadcast join is a left join and the count coalesces to 0.
   *
   * Same 100 TB shape as X-decontaminate: eval grams (megabytes) reduce and
   * BROADCAST; the corpus streams through the broadcast hash join unshuffled;
   * the only exchange is the per-doc count keyed on the id with map-side
   * partials. Score is a single integer division — identical operands on
   * any engine, so the 6dp round is cross-engine exact.
   */
  def contaminationScore(
      docs: DataFrame,
      evalDocs: DataFrame,
      n: Int = 3,
      flagAt: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    SketchFunctions.register(docs.sparkSession)
    val evalGrams = evalDocs
      .select(explode(array_distinct(wordNgrams(col(textCol), n))).as("_gram"))
      .distinct()
    val grams = docs
      .select(col(idCol), array_distinct(wordNgrams(col(textCol), n)).as("_grams"))
      .where(size(col("_grams")) > 0)
      .withColumn("n_grams", size(col("_grams")))
    grams
      .select(col(idCol), col("n_grams"), explode(col("_grams")).as("_gram"))
      .join(broadcast(evalGrams.withColumn("_hit", lit(1))), Seq("_gram"), "left")
      .groupBy(idCol, "n_grams")
      .agg(sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_shared"))
      .withColumn("score", col("n_shared") / col("n_grams"))
      .select(col(idCol), col("n_grams").cast("long").as("n_grams"), col("n_shared"),
        round(col("score"), 6).as("score"),
        (col("score") >= flagAt).as("contaminated"))
  }

  /**
   * X48: all pairs within edit distance `d` over a short string key —
   * fuzzy-duplicate detection for titles, names, URLs, and other near-fixed
   * strings where MinHash shingles are too coarse. Candidate generation is
   * the PassJoin segment pigeonhole (Li, Deng, Feng — ICDE 2011 family),
   * which GUARANTEES recall: partition every indexed key of length ls into
   * d+1 contiguous segments (first (d+1)-rem of ⌊ls/(d+1)⌋ chars, the rest
   * one longer); if ed(s,t) ≤ d then ≤ d edits touch ≤ d segments, so some
   * segment of s survives VERBATIM in t, displaced by at most d positions
   * (each insertion/deletion before it shifts it by one). The probe side
   * therefore enumerates, per key, every (candidate length ls ∈ lt±d,
   * slot i, shift ∈ ±d) substring — a CONSTANT ≤ (2d+1)²(d+1) keys per row
   * (75 at d=2) — and candidates fall out of a plain hash equi-join on
   * (ls, slot, substring). Never an all-pairs product, never a
   * similarity-join nested loop; survivors re-verify with exact
   * levenshtein. Output: (id_a < id_b, edit_distance ≤ d), ed 0 included
   * (exact key dupes are still dupes).
   *
   * 100 TB shape: both planes are linear in the corpus with constant
   * fan-out; the join shuffles 16-byte-ish segment keys; the verify join
   * carries only candidate ids back to the key frame. Hot segment buckets
   * (low-entropy keys: empty-ish titles, boilerplate prefixes) are capped
   * like every other pair family — keys whose (ls, slot, segment) bucket
   * exceeds `maxDocsPerSegment` on the INDEX side leave candidate
   * generation (bounded recall loss, only on flooded buckets; None
   * disables). Keys shorter than d+1 (zero-length segments would match
   * everywhere) are excluded — route them to an exact group-by, they have
   * at most d+1 characters.
   */
  def editDistancePairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      keyCol: String = "key",
      d: Int = 2,
      maxDocsPerSegment: Option[Int] = Some(1000)): DataFrame = {
    require(d >= 1 && d <= 4, s"edit distance bound $d out of [1,4]")
    val k = d + 1
    val keyed = docs
      .select(col(idCol).cast("long").as("id"), col(keyCol).cast("string").as("key"))
      .where(col("key").isNotNull && length(col("key")) >= k)
      .withColumn("len", length(col("key")))

    // segment geometry as expressions over a length column
    def segLen(i: Column, ls: Column): Column =
      ((ls / k).cast("int") + when(i >= lit(k) - pmod(ls, lit(k)), 1).otherwise(0))
    def segStart(i: Column, ls: Column): Column =
      (i * (ls / k).cast("int") +
        greatest(lit(0), i - (lit(k) - pmod(ls, lit(k))))).cast("int")

    // index plane: each key's own d+1 segments
    val slots = sequence(lit(0), lit(d))
    val indexPlane = keyed.select(col("id"), col("key"), col("len"),
        posexplode(transform(slots, i =>
          col("key").substr(segStart(i, col("len")) + 1, segLen(i, col("len"))))))
      .select(col("id").as("id_i"), col("len").as("ls"),
        col("pos").as("slot"), col("col").as("seg"))

    val cappedIndex = maxDocsPerSegment match {
      case None => indexPlane
      case Some(cap) =>
        val hot = indexPlane.groupBy("ls", "slot", "seg")
          .agg(count(lit(1)).as("_n")).where(col("_n") > cap)
          .select("ls", "slot", "seg")
        indexPlane.join(broadcast(hot), Seq("ls", "slot", "seg"), "left_anti")
    }

    // probe plane: every (ls, slot, shifted position) substring that a
    // within-d partner's segment could occupy — constant fan-out per key
    val probeCands = flatten(flatten(transform(
      sequence(col("len") - d, col("len") + d), ls =>
        transform(slots, i =>
          transform(sequence(lit(-d), lit(d)), sh =>
            struct(ls.as("ls"), i.as("slot"),
              (segStart(i, ls) + sh).as("p"), segLen(i, ls).as("l")))))))
    val probePlane = keyed
      .select(col("id"), col("key"), col("len"), explode(probeCands).as("c"))
      .where(col("c.ls") >= k && col("c.p") >= 0 &&
        col("c.p") + col("c.l") <= col("len"))
      .select(col("id").as("id_p"), col("c.ls").as("ls"), col("c.slot").as("slot"),
        col("key").substr(col("c.p") + 1, col("c.l")).as("seg"))

    val candidates = cappedIndex.join(probePlane, Seq("ls", "slot", "seg"))
      .where(col("id_i") =!= col("id_p"))
      .select(least(col("id_i"), col("id_p")).as("id_a"),
        greatest(col("id_i"), col("id_p")).as("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(keyed.select(col("id").as("id_a"), col("key").as("ka")), Seq("id_a"))
      .join(keyed.select(col("id").as("id_b"), col("key").as("kb")), Seq("id_b"))
      .withColumn("edit_distance", levenshtein(col("ka"), col("kb")))
      .where(col("edit_distance") <= d)
      .select(col("id_a"), col("id_b"), col("edit_distance"))
  }

  /**
   * Sub-document (segment-level) dedup — the paragraph-dedup pass of a web
   * pipeline, degraded to fixed `segTokens`-token windows for corpora with
   * no paragraph separators: boilerplate repeated ACROSS documents is
   * dropped from every occurrence but the globally first. Per doc returns
   * the surviving text (original segment order), `n_kept` and `n_dropped`.
   *
   * Winner selection is a groupBy-MIN over (doc id, segment index) structs,
   * NOT a row_number window: boilerplate is precisely the hot-key case (one
   * segment repeated across millions of docs), and partial map-side
   * aggregation folds each hot key to one row per task, where a window
   * would funnel every occurrence through a single partition. Segments
   * shuffle by md5 digest, not text, so wide rows never ride the exchange
   * twice; the reassembly is one groupBy over the doc key.
   */
  def segmentDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      segTokens: Int = 10): DataFrame = {
    require(segTokens >= 1, s"segTokens $segTokens")
    val toks = split(col(textCol), " ")
    // ceil(n/segTokens); n >= 1 because split("", " ") = [""]
    val nSeg = ((size(toks) + lit(segTokens - 1)) / lit(segTokens.toDouble)).cast("int")
    val segs = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(transform(sequence(lit(0), nSeg - 1),
          i => array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " ")))
          .as(Seq("seg_idx", "seg")))
      .withColumn("h", md5(col("seg")))
    val winners = segs
      .groupBy("h")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("w"))
      .select(col("h"), col("w.doc_id").as("doc_id"), col("w.seg_idx").as("seg_idx"),
        lit(true).as("keep"))
    segs.join(winners, Seq("h", "doc_id", "seg_idx"), "left_outer")
      .groupBy("doc_id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("keep"), struct(col("seg_idx"), col("seg"))))),
          s => s.getField("seg"))).as("text_clean"),
        sum(when(col("keep"), 1).otherwise(0)).cast("bigint").as("n_kept"),
        sum(when(col("keep").isNull, 1).otherwise(0)).cast("bigint").as("n_dropped"))
  }

  /**
   * X52: boilerplate scrub — the DOCUMENT-FREQUENCY-threshold cousin of
   * [[segmentDedup]] (X30) and the other standard sub-document pass of a
   * web pipeline (CCNet's "remove frequent lines"): a segment occurring in
   * MORE THAN `maxDocFreq` DISTINCT documents is boilerplate (nav bars,
   * cookie banners, license footers) and is removed from EVERY document —
   * including the first. X30 answers "keep one copy of each segment"
   * (dedup); this answers "no copy of a too-common segment is content"
   * (cleaning) — different production stages, different survivors.
   *
   * Scale shape: the doc-frequency table first collapses (digest, doc)
   * repeats WITHIN a document — that groupBy's keys are distinct per doc,
   * so a million-document boilerplate segment spreads over the cluster
   * instead of hot-keying one partition — then counts documents per digest
   * with map-side partials. Segments ride every exchange as md5 digests,
   * never text; the hot set joins back as a plain digest equi-join (its
   * size is data-dependent, so no broadcast assumption), and reassembly is
   * the same one groupBy over the doc key as X30.
   */
  def boilerplateScrub(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      segTokens: Int = 10,
      maxDocFreq: Int = 2): DataFrame = {
    require(segTokens >= 1, s"segTokens $segTokens")
    require(maxDocFreq >= 1, s"maxDocFreq $maxDocFreq")
    val toks = split(col(textCol), " ")
    val nSeg = ((size(toks) + lit(segTokens - 1)) / lit(segTokens.toDouble)).cast("int")
    val segs = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(transform(sequence(lit(0), nSeg - 1),
          i => array_join(slice(toks, i * segTokens + 1, lit(segTokens)), " ")))
          .as(Seq("seg_idx", "seg")))
      .withColumn("h", md5(col("seg")))
    val hot = segs.select("h", "doc_id").distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDocFreq)
      .select(col("h"), lit(true).as("boiler"))
    segs.join(hot, Seq("h"), "left_outer")
      .groupBy("doc_id")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("boiler").isNull, struct(col("seg_idx"), col("seg"))))),
          s => s.getField("seg"))).as("text_clean"),
        sum(when(col("boiler").isNull, 1).otherwise(0)).cast("bigint").as("n_kept"),
        sum(when(col("boiler"), 1).otherwise(0)).cast("bigint").as("n_dropped"))
  }

  /**
   * X36: exact POSITIONAL span dedup — the exact-substring-deduplication
   * shape of Lee et al. 2021 ("Deduplicating Training Data Makes Language
   * Models Better"), on word windows: every OVERLAPPING `spanTokens`-token
   * window (stride 1) of every document hashes; a window occurring at more
   * than one (doc, pos) site keeps only its globally-first site (min doc id,
   * then min position) and every other site is returned as an excision
   * candidate. Overlap is what separates this from [[segmentDedup]] (X30,
   * fixed stride-L chunks): a duplicated passage is caught at EVERY
   * alignment, not only when it lands on a chunk boundary.
   *
   * Shuffle discipline: windows ride the exchange as 16-byte md5 digests,
   * never the window text (the native word_ngrams pass emits the gram, the
   * projection hashes it before the shuffle); winner selection is the same
   * skew-safe groupBy-MIN over (doc, pos) structs as X30 — a
   * million-occurrence boilerplate window partial-aggregates map-side —
   * and only digests with ≥ 2 sites survive into the (equi-join) marking
   * pass. Output rows ≈ duplicated-span sites, not the window plane.
   */
  def spanDedup(
      docs: DataFrame,
      spanTokens: Int = 10,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(spanTokens >= 1, s"spanTokens $spanTokens")
    SketchFunctions.register(docs.sparkSession)
    val spans = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(SketchFunctions.word_ngrams(col(textCol), spanTokens))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("digest"))
    val winners = spans
      .groupBy("digest")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"), count(lit(1)).as("n_sites"))
      .where(col("n_sites") >= 2)
      .select(col("digest"), col("w.doc_id").as("w_doc"), col("w.pos").as("w_pos"))
    spans.join(winners, Seq("digest"))
      .where(col("doc_id") =!= col("w_doc") || col("pos") =!= col("w_pos"))
      .select(col("doc_id"), col("pos").cast("bigint").as("pos"))
  }

  /**
   * X55: MAXIMAL cross-document shared-run extraction — the provenance /
   * audit twin of [[spanDedup]] (X36 marks duplicate window SITES for
   * excision; this reconstructs, per document pair, the full extent of
   * every shared passage): all maximal token runs of length ≥ `spanTokens`
   * occurring in both documents of a pair, reported as
   * (doc_a, doc_b, start_a, start_b, run_tokens). The reporting shape of
   * Lee et al. 2021's ExactSubstr — what a contamination review or an
   * excision-sizing pass actually reads.
   *
   * Dataflow: overlapping `spanTokens`-token windows hash to digests with
   * their positions (the X36 plane); per-digest site counts gate the plane
   * to digests with 2..`maxSitesPerDigest` sites (boilerplate floods are a
   * CLEANING concern — X52 boilerplateScrub — not a pairing one; the cap
   * keeps the self-join from going quadratic on a hot window, the
   * editDistancePairs discipline); the self-join on digest with
   * `doc_a < doc_b` yields aligned hits, and a gaps-and-islands pass per
   * (pair, alignment offset) — `island = pos_a − row_number()` over
   * consecutive window positions — folds runs of overlapping windows into
   * ONE maximal-run row: a shared passage of L tokens is L−k+1 aligned
   * window hits and exactly one island.
   *
   * Shuffle shape for 100 TB: windows ride exchanges as md5 digests (never
   * text); the self-join is a hash equi-join on digest over the
   * count-gated plane; the island window partitions by (a, b, offset) —
   * per-key row count is bounded by document length, so no corpus-scale
   * key exists. Output rows ≈ shared passages, not the window plane.
   */
  def sharedRunPairs(
      docs: DataFrame,
      spanTokens: Int = 10,
      maxSitesPerDigest: Int = 64,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(spanTokens >= 1, s"spanTokens $spanTokens")
    require(maxSitesPerDigest >= 2, s"maxSitesPerDigest $maxSitesPerDigest")
    SketchFunctions.register(docs.sparkSession)
    val spans = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(SketchFunctions.word_ngrams(col(textCol), spanTokens))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(col("gram")).as("digest"))
    val gated = spans
      .join(spans.groupBy("digest").agg(count(lit(1)).as("n_sites"))
          .where(col("n_sites").between(2, maxSitesPerDigest))
          .select("digest"),
        Seq("digest"))
    val hits = gated.as("x").join(gated.as("y"),
        col("x.digest") === col("y.digest") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.pos").as("pos_a"), col("y.pos").as("pos_b"))
    val w = Window
      .partitionBy(col("doc_a"), col("doc_b"), (col("pos_a") - col("pos_b")).as("off"))
      .orderBy(col("pos_a"))
    hits
      .withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("pos_a") - col("pos_b"), col("island"))
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (count(lit(1)) + lit(spanTokens.toLong - 1L)).as("run_tokens"))
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("run_tokens"))
  }

  // ===================================================================
  // X46: incremental NEAR-dup dedup against a PERSISTED MinHash band index.
  //
  // X26/X26b cover cross-run EXACT dedup (hash / Bloom planes); this is the
  // near-dup twin: a nightly batch must find which of its docs
  // near-duplicate an already-ingested corpus WITHOUT re-pairing the
  // corpus. The corpus's banding plane persists once; each batch signs
  // itself, bands itself, and equi-joins the index on (band, bucket) — only
  // colliding buckets produce candidate rows, so per-run cost is
  // O(batch + collisions), never O(corpus) and never all-pairs. The X41
  // stream-maintained ANN index, applied to text.

  /** Persist the near-dup index for `docs` under `path`: three planes —
    *  - `bands`   (band, bucket, id): REP-level banding rows, hot buckets
    *    capped at BUILD time (the probe must not re-aggregate the whole
    *    index every run to find them). Identical signatures collapse to
    *    their min-id rep first, so a flood of N identical docs contributes
    *    one banding row per band and the cap only ever drops buckets of
    *    genuinely distinct signatures (hash pile-ups), never dup floods;
    *  - `sigs`    (id, sig): rep-level signatures for the estimate gate;
    *  - `members` (id, rep): expansion plane back to every corpus doc.
    * Layout: bands is repartitioned on (band, bucket) so each probe-side
    * shuffle partition reads a contiguous bucket range; at 100 TB the
    * corpus pays this shuffle ONCE at build, and every nightly probe
    * shuffles only its own batch. */
  def writeNearDupIndex(
      docs: DataFrame,
      path: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 64,
      bands: Int = 32,
      shingleN: Int = 3,
      maxBucketSize: Int = 1000): Unit = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    SketchFunctions.register(docs.sparkSession)
    val signed = signatures(docs, idCol, textCol, k, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (members, reps) = sigGroups(signed)
    val banded = reps.select(col("id"),
      posexplode(SketchFunctions.minhash_bands(col("sig"), bands)).as(Seq("band", "bucket")))
    val hot = banded.groupBy("band", "bucket").agg(count(lit(1)).as("_bsz"))
      .where(col("_bsz") > maxBucketSize).select("band", "bucket")
    banded.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      .repartition(col("band"), col("bucket"))
      .write.mode("overwrite").parquet(s"$path/bands")
    reps.write.mode("overwrite").parquet(s"$path/sigs")
    members.write.mode("overwrite").parquet(s"$path/members")
    signed.unpersist()
  }

  /** Probe a [[writeNearDupIndex]] index with a new batch: returns the
    * exact-verified cross-run near-dup matches
    * (`id_new`, `id_base`, `jaccard`), jaccard computed EXACTLY on n-gram
    * sets (the sketch supplies recall, the verify supplies precision — same
    * contract as [[minhashVerifiedPairs]], so the output is
    * oracle-comparable against all-pairs SQL truth). `baseDocs` supplies
    * the corpus text for the verify join; only docs that appear in some
    * candidate pair are ever re-read, and the join is an equi-join on id.
    *
    * Scale shape: the batch signs and bands itself (one narrow projection),
    * the index `bands` plane streams through ONE equi-join on
    * (band, bucket) — a non-colliding bucket contributes zero rows and no
    * downstream work — and the gram verify touches only candidate ids.
    * Nothing aggregates or re-shuffles the corpus-sized planes.
    *
    * PRECONDITION (r16): `verifyThreshold` must be > 0. The verify relies
    * on the jaccard bar to drop zero-gram pairs (an explicit size>0 guard
    * would get pushed below the candidate semi-join and re-tokenize the
    * whole corpus); at threshold 0 that bar stops filtering and the method
    * throws rather than silently emit 0/0 pairs the old shape dropped. */
  def probeNearDupIndex(
      newDocs: DataFrame,
      indexPath: String,
      baseDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 64,
      bands: Int = 32,
      shingleN: Int = 3,
      candidateThreshold: Double = 0.2,
      verifyThreshold: Double = 0.8): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    val spark = newDocs.sparkSession
    SketchFunctions.register(spark)
    val idxBands = spark.read.parquet(s"$indexPath/bands")
      .select(col("band"), col("bucket"), col("id").as("_rb"))
    val idxSigs = spark.read.parquet(s"$indexPath/sigs")
      .select(col("id").as("_rb"), col("sig").as("sig_b"))
    val idxMembers = spark.read.parquet(s"$indexPath/members")
      .select(col("id").as("id_base"), col("rep").as("_rb"))

    val newSigned = signatures(newDocs, idCol, textCol, k, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (newMembers, newReps) = sigGroups(newSigned)
    val newBanded = newReps.select(col("id").as("_ra"),
      posexplode(SketchFunctions.minhash_bands(col("sig"), bands)).as(Seq("band", "bucket")))

    // THE probe: one equi-join on (band, bucket). Candidates collapse to
    // rep-level id pairs before anything signature- or text-sized joins in.
    val repCands0 = newBanded.join(idxBands, Seq("band", "bucket"))
      .select(col("_ra"), col("_rb")).dropDuplicates("_ra", "_rb")
    val repCands =
      if (candidateThreshold <= 0) repCands0
      else repCands0
        .join(newSigned.select(col("id").as("_ra"), col("sig").as("sig_a")), Seq("_ra"))
        .join(idxSigs, Seq("_rb"))
        .where(SketchFunctions.sig_agreement(col("sig_a"), col("sig_b")) >= candidateThreshold)
        .select("_ra", "_rb")

    // Expand rep pairs to member pairs on both sides (identical-signature
    // groups share their rep's signature exactly, so the gate generalizes).
    val cands = repCands
      .join(newMembers.select(col("rep").as("_ra"), col("id").as("id_new")), Seq("_ra"))
      .join(idxMembers, Seq("_rb"))
      .select(col("id_new"), col("id_base"))
      .dropDuplicates("id_new", "id_base")

    // Verify tokenizes each CANDIDATE DOC exactly once (r16): the r15
    // shape computed `array_distinct(wordNgrams(text))` below the pair
    // join, re-tokenizing the ENTIRE baseDocs corpus per probe — O(corpus)
    // per nightly batch / per micro-batch, the work this index exists to
    // avoid. (A first r16 cut attached raw text through the pair join and
    // tokenized per candidate PAIR row instead — which inverts when
    // candidate neighborhoods are dense: the sf1 replica corpus has ~130k
    // candidate pairs over ~40k docs, and d_stream_web_pipeline_dedup went
    // 13.5→42 s at sf1.) The BASE side SEMI-JOINS to its candidate id set
    // before tokenizing, so corpus-side gram computation is O(candidate
    // docs), one tokenize per doc — never O(corpus), never O(pairs); the
    // NEW side tokenizes the whole batch (O(batch), already the probe's
    // contract on that side — see gramsAll below). cands is checkpointed
    // because two consumers read it (the base id set + the pair join); the
    // emitted pair set is unchanged (restricting gram planes to candidate
    // ids drops only rows the inner join dropped anyway).
    // No explicit zero-gram guard: a `where(size(grams) > 0)` here gets
    // PUSHED below the semi join as a filter predicate, re-tokenizing the
    // whole corpus (plan-checked) — and it is redundant anyway, because a
    // zero-gram side yields jaccard 0 (or NULL on 0/0), which the
    // `jaccard >= verifyThreshold` filter drops for any positive bar.
    require(verifyThreshold > 0,
      s"verifyThreshold must be > 0 (zero-gram pairs are dropped by the jaccard bar), got $verifyThreshold")
    val candsM = cands.localCheckpoint(true)
    // r17: the NEW side tokenizes the WHOLE batch, no semi-join — the probe
    // contract already pays O(batch) on that side (signatures computes the
    // same shingles per row), so restricting it to candidates saved no
    // asymptotic work while costing a distinct aggregate + broadcast build
    // + semi-join PER PROBE (once per micro-batch in the streaming
    // consumers; the r16 shape's job floor). Non-candidate batch rows are
    // dropped by the inner pair join exactly as the semi-join dropped them.
    // The BASE side keeps its candidate semi-join — that side is
    // corpus-sized and O(candidate docs) there is the whole point — but
    // drops the `.distinct()` build-side aggregate: left_semi dedups
    // inherently, duplicate build ids change nothing.
    def gramsAll(df: DataFrame, out: String): DataFrame = df
      .select(col(idCol).as(out),
        array_distinct(wordNgrams(col(textCol), shingleN)).as(s"g_$out"))
      .withColumn(s"n_$out", size(col(s"g_$out")))
    def gramsFor(df: DataFrame, out: String): DataFrame = df
      .join(candsM.select(col(out).as(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol).as(out),
        array_distinct(wordNgrams(col(textCol), shingleN)).as(s"g_$out"))
      .withColumn(s"n_$out", size(col(s"g_$out")))
    // The jaccard bar is NULL-SAFE (coalesce) on purpose: a bare
    // `jaccard >= t` filter lets InferFiltersFromConstraints derive
    // isnotnull(jaccard) → isnotnull(size(grams)) and push THAT below the
    // semi join, where it re-tokenizes every corpus row just to test a
    // predicate (plan-checked; same mechanism as guide §4.4's duplicated
    // UDF). coalesce(NULL→0) < t drops the 0/0 zero-gram pairs, which is
    // the same set the old explicit size>0 guard removed.
    val result = candsM
      .join(gramsAll(newDocs, "id_new"), Seq("id_new"))
      .join(gramsFor(baseDocs, "id_base"), Seq("id_base"))
      .withColumn("inter", size(array_intersect(col("g_id_new"), col("g_id_base"))))
      .withColumn("jaccard",
        col("inter") / (col("n_id_new") + col("n_id_base") - col("inter")))
      .where(coalesce(col("jaccard"), lit(0.0)) >= verifyThreshold)
      .select(col("id_new"), col("id_base"), round(col("jaccard"), 6).as("jaccard"))
      .localCheckpoint(true)
    newSigned.unpersist()
    result
  }

  /** Append a batch's planes to an existing [[writeNearDupIndex]] index —
    * the production cycle: probe, keep the survivors, APPEND them so the
    * next batch dedups against corpus+batch without ever rebuilding.
    * Append-only parquet writes of batch-sized frames; the corpus planes
    * are untouched. Within-batch identical signatures still collapse to a
    * rep (a batch flood costs one banding row per band); a batch sig that
    * matches an existing index rep simply adds a second rep to the same
    * buckets — probes match both and member expansion stays correct. The
    * hot-bucket cap is enforced at build; a bucket that crosses the cap
    * only through appends degrades gradually until the next
    * [[writeNearDupIndex]] rebuild (the compaction analogue, same cadence
    * call as any LSM-style index). */
  def appendNearDupIndex(
      docs: DataFrame,
      indexPath: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 64,
      bands: Int = 32,
      shingleN: Int = 3,
      /** Files per plane per append (r17, guide §6). An appended batch is
        * small relative to the corpus by this index's contract, but the
        * planes were appended at the session's shuffle-partition width —
        * up to 8–32 near-empty files PER BATCH, so a stream that probes
        * after every append paid an ever-growing listing + per-file open
        * tax (the r16 verdict's noisiest rows). One file per batch-sized
        * append keeps probe cost file-count-stable; a caller appending a
        * genuinely large batch sizes this to `ceil(batch_bytes / target
        * file size)` instead. */
      appendFilesPerPlane: Int = 1): Unit = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    require(appendFilesPerPlane >= 1,
      s"appendFilesPerPlane must be >= 1, got $appendFilesPerPlane")
    SketchFunctions.register(docs.sparkSession)
    val signed = signatures(docs, idCol, textCol, k, shingleN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (members, reps) = sigGroups(signed)
    reps.select(col("id"),
      posexplode(SketchFunctions.minhash_bands(col("sig"), bands)).as(Seq("band", "bucket")))
      .coalesce(appendFilesPerPlane)
      .write.mode("append").parquet(s"$indexPath/bands")
    reps.coalesce(appendFilesPerPlane).write.mode("append").parquet(s"$indexPath/sigs")
    members.coalesce(appendFilesPerPlane).write.mode("append").parquet(s"$indexPath/members")
    signed.unpersist()
  }

  /** Survivors of an incremental near-dup pass: `newDocs` minus every doc
    * with an exact-verified near-dup already in the indexed corpus. One
    * anti-join on id over [[probeNearDupIndex]]'s (small) match set. */
  def nearDupSurvivors(
      newDocs: DataFrame,
      indexPath: String,
      baseDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      verifyThreshold: Double = 0.8): DataFrame = {
    val doomed = probeNearDupIndex(newDocs, indexPath, baseDocs, idCol, textCol,
      verifyThreshold = verifyThreshold)
      .select(col("id_new").as(idCol)).distinct()
    newDocs.join(doomed, Seq(idCol), "left_anti")
  }
}
