package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VectorFunctions.{cosine_f32, dot_f32}

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Baseline: brute-force cosine top-k — a single codegen'd scan using the
 * native CosineSimilarityFloat expression (graft.plans.VectorExpressions),
 * no shuffle until the final top-k.
 *
 * Scale path: random-hyperplane LSH bucketing — vectors land in 2^nPlanes
 * buckets; queries probe only their own bucket (plus optional multi-probe
 * neighbors), cutting the scan by the bucket fan-out. Hyperplanes are
 * deterministic (seeded hash-derived pseudo-random components), so plans are
 * reproducible without driver-side RNG state.
 */
object Similarity {

  /** Cosine similarity of two array<float> columns (native fused expression). */
  def cosine(a: Column, b: Column): Column = cosine_f32(a, b)

  def dot(a: Column, b: Column): Column = dot_f32(a, b)

  /**
   * Brute-force top-k by cosine against a single query vector. The query rides
   * as a literal array — no join, the comparison stays inside one
   * WholeStageCodegen scan; the only shuffle is the global top-k sort, which
   * AQE executes as a partial per-partition top-k + tiny final merge
   * (TakeOrderedAndProject).
   */
  def bruteForceTopK(
      vectors: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      excludeIds: Seq[Long] = Seq.empty): DataFrame = {
    val q = array(queryVec.map(v => lit(v)): _*).cast("array<float>")
    val base = vectors
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("sim"))
    val filtered = if (excludeIds.isEmpty) base else base.where(!col(idCol).isin(excludeIds: _*))
    filtered.orderBy(col("sim").desc, col(idCol).asc).limit(k)
  }

  /**
   * Deterministic pseudo-random hyperplane component for (plane, dim):
   * xxhash64 → scaled to [-1, 1]. Gives seeded, reproducible LSH without
   * shipping a matrix.
   */
  private def planeComponent(plane: Int, dim: Column, seed: Long): Column =
    (xxhash64(lit(seed), lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /**
   * Random-hyperplane LSH bucket id (nPlanes-bit signature) for each vector:
   * bit p = sign(v · h_p). One pass, no shuffle.
   */
  def lshBucket(vecCol: Column, dim: Int, nPlanes: Int = 8, seed: Long = 42L): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vecCol, sequence(lit(0), lit(dim - 1)),
          (v, i) => v.cast("double") * planeComponent(p, i, seed)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Attach LSH bucket ids; downstream ANN joins key on `bucket` — at 100 TB
    * the bucketed layout (writer: `.write.partitionBy("bucket")`) turns each
    * query into a pruned scan of ~1/2^nPlanes of the corpus. */
  def withLshBuckets(vectors: DataFrame, dim: Int, nPlanes: Int = 8,
      vecCol: String = "embedding", seed: Long = 42L): DataFrame =
    vectors.withColumn("bucket", lshBucket(col(vecCol), dim, nPlanes, seed))

  /**
   * ANN top-k via LSH: probe the query's bucket plus all buckets within
   * `probeHamming` bit flips (multi-probe), then exact cosine within the
   * candidate set. Approximate by construction — recall grows with
   * probeHamming; probeHamming = nPlanes degenerates to brute force.
   */
  def lshTopK(
      vectors: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      dim: Int,
      nPlanes: Int = 8,
      probeHamming: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val bucketed = withLshBuckets(vectors, dim, nPlanes, vecCol, seed)
    val q = array(queryVec.map(v => lit(v)): _*).cast("array<float>")
    // Query bucket computed the same way, on a 1-row frame, then broadcast
    // as a literal set of probe buckets.
    val qBucketRow = bucketed.sparkSession.range(1)
      .select(lshBucket(typedLit(queryVec).cast("array<float>"), dim, nPlanes, seed).as("b"))
      .head()
    val qBucket = qBucketRow.getLong(0)
    val probes: Seq[Long] = (0L until (1L << nPlanes))
      .filter(b => java.lang.Long.bitCount(b ^ qBucket) <= probeHamming)
    bucketed
      .where(col("bucket").isin(probes: _*))
      .select(col(idCol), round(cosine(col(vecCol), q), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /**
   * Embedding-cosine near-duplicate pairs (sim ≥ threshold) via LSH blocking:
   * pairs must collide in at least one band of planes. Exact cosine verifies
   * every candidate. One shuffle on the bucket key; no all-pairs product.
   */
  def cosineNearDupPairs(
      vectors: DataFrame,
      threshold: Double,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      bands: Int = 4,
      planesPerBand: Int = 4,
      seed: Long = 42L): DataFrame = {
    val withBands = vectors.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          lshBucket(col(vecCol), dim, planesPerBand, seed + b).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("v"), col("bb.band"), col("bb.bucket"))
    val l = withBands.select(col("band"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = withBands.select(col("band"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), round(cosine(col("v_a"), col("v_b")), 6).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** Exact all-pairs cosine ≥ threshold on a bounded subset (the oracle-
    * checkable variant; the LSH one above is the scale path). */
  def exactNearDupPairs(
      vectors: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val l = vectors.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val r = vectors.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    l.crossJoin(r)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("v_a"), col("v_b")), 6).as("sim"))
      .where(col("sim") >= threshold)
  }
}
