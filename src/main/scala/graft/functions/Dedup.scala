package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/**
 * Corpus deduplication at scale: exact, MinHash+LSH, SimHash, and exact
 * n-gram Jaccard. All sketches are built from codegen'd built-ins
 * (xxhash64 over shingles + higher-order array ops) — no UDFs, no
 * driver-side loops; every stage is a scan or a key-partitioned shuffle.
 *
 * Shuffle discipline (the 100 TB concern):
 *  - exact dedup: one shuffle on the content hash;
 *  - MinHash LSH: one shuffle on (band, bandHash) — candidate pairs are
 *    generated per-bucket, never all-pairs;
 *  - verification joins key on docId pairs only, carrying signatures, not text.
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

  /**
   * MinHash signature: k independent min-hashes over word-`n`-gram shingles.
   * Hash family: xxhash64(shingle, seed_i) — deterministic, seeded, codegen'd.
   * Returns an array<bigint> column of length k.
   */
  def minhashSignature(text: Column, k: Int = 64, shingleN: Int = 3): Column = {
    val grams = wordNgrams(text, shingleN)
    val nonEmpty = when(size(grams) === 0, array(lit("")) ).otherwise(grams)
    val seeds = sequence(lit(0), lit(k - 1))
    transform(seeds, seed =>
      array_min(transform(nonEmpty, g => xxhash64(g, seed))))
  }

  /**
   * MinHash+LSH candidate pairs: band the k-signature into `bands` bands of
   * k/bands rows each, bucket on (band, hash(band slice)), and pair up within
   * buckets. Estimated Jaccard = fraction of agreeing signature positions.
   * Pairs with estimate ≥ `threshold` survive.
   *
   * Scale shape: explode to (docs × bands) rows → ONE shuffle on the bucket
   * key → per-bucket self-join (buckets are tiny under any sane banding) →
   * distinct pair set. No all-pairs product ever materializes.
   */
  def minhashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 64,
      bands: Int = 16,
      shingleN: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    val rowsPerBand = k / bands

    val signed = docs
      .select(col(idCol).as("id"), minhashSignature(col(textCol), k, shingleN).as("sig"))

    val banded = signed
      .select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast("string")).as("bucket")))).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))

    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b), x => x))
          / lit(k.toDouble))
      .where(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** MinHash dedup: survivors = docs minus the higher-id member of every
    * near-dup pair (connected via the pair set's right side). */
  def minhashDedup(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.7): DataFrame = {
    val doomed = minhashPairs(docs, idCol, textCol, threshold = threshold)
      .select(col("id_b").as(idCol)).distinct()
    docs.join(doomed, Seq(idCol), "left_anti")
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup pairs within Hamming distance `maxHamming`: block on the
   * four 16-bit sub-fingerprints (pigeonhole: any pair with ≤ 3 differing
   * bits out of 64 agrees exactly on at least one of the 4 blocks), then
   * verify exact Hamming inside each block-bucket. One shuffle on the block
   * key — never an all-pairs product.
   */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-block pigeonhole blocking is exact only for maxHamming <= 3")
    val hashed = docs.select(col(idCol).as("id"), simhashColumn(col(textCol)).as("sh"))
    val blocked = hashed.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b => struct(lit(b).as("blk"),
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("blkval"))): _*)).as("x"))
      .select(col("id"), col("sh"), col("x.blk"), col("x.blkval"))
    val l = blocked.select(col("blk"), col("blkval"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = blocked.select(col("blk"), col("blkval"), col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, Seq("blk", "blkval"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** 64-bit SimHash fingerprint: per bit position, majority vote over token
    * hashes (+1 when the hash has the bit set, −1 otherwise); the sign forms
    * the fingerprint bit. Pure array expressions — codegen'd, no UDF. */
  def simhashColumn(text: Column): Column = {
    val hs = transform(tokens(text), t => xxhash64(t))
    // For each bit i: majority vote of hash bits → fingerprint bit.
    val bits = (0 until 64).map { i =>
      val votes = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(shiftleft(lit(1L), i)) =!= 0, lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /**
   * Exact n-gram Jaccard similarity pairs ≥ `threshold`, computed without an
   * all-pairs product: explode distinct shingles, join docs sharing a shingle
   * (any pair with Jaccard > 0 shares ≥ 1 shingle, so this blocking is
   * EXACT), count shared shingles per pair, then |A∩B| / (|A|+|B|−|A∩B|).
   * Shuffles: one on shingle, one on the pair key. Hot shingles are the skew
   * risk at scale — cap explode width with `maxDocsPerShingle` (AQE handles
   * residual skew).
   */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val shingled = docs
      .select(col(idCol).as("id"), array_distinct(wordNgrams(col(textCol), n)).as("grams"))
      .where(size(col("grams")) > 0)
      .withColumn("n_grams", size(col("grams")))

    val exploded = shingled.select(col("id"), col("n_grams"), explode(col("grams")).as("g"))
    val l = exploded.select(col("g"), col("id").as("id_a"), col("n_grams").as("na"))
    val r = exploded.select(col("g"), col("id").as("id_b"), col("n_grams").as("nb"))
    l.join(r, Seq("g"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
