package graft

import org.apache.spark.sql.functions._

import graft.plans.{VectorFunctions, VectorOps}

/**
 * Round-11 regression: banded-LSH bands must be INDEPENDENT. The original
 * plane derivation seeded band b at `seed + b`, making band b's plane p
 * byte-identical to band b+1's plane p−1 — the bands were one sliding
 * window over bands+planesPerBand−1 distinct planes, and a single sign
 * flip on a mid-window plane killed every band at once (observed at sf1:
 * cosine-0.9999994 pairs missed, 37 wrong survivors in e_semantic_dedup).
 */
class LshBandIndependenceSpec extends SparkSpec {
  import spark.implicits._

  test("band plane matrix has no repeated plane across the whole matrix") {
    val bands = 8; val ppb = 16
    val planes = VectorOps.bandPlanes(dim = 64, bands, ppb, seed = 42L)
    assert(planes.length == bands * ppb)
    val distinct = planes.map(_.toSeq).toSet
    assert(distinct.size == bands * ppb,
      s"only ${distinct.size} distinct planes for ${bands * ppb} (band, plane) slots — bands share planes")
  }

  test("near-identical vectors collide in at least one band (sliding-window regression)") {
    // 200 deterministic pseudo-random unit-ish vectors, each with a tiny
    // perturbed twin (relative ~1e-5 ⇒ θ ~1e-5): under independent bands
    // the probability a twin pair misses all 8 bands is ~1e-38 per pair;
    // under the sliding-window bug a single mid-window sign flip (per-pair
    // probability ~1e-4 × 200 pairs... amplified by boundary-hugging
    // coordinates) silently killed every band at once at sf1 scale.
    val dim = 64
    def vec(i: Int): Seq[Float] =
      (0 until dim).map(d => (VectorOps.splitmix64(i.toLong * dim + d).toDouble /
        Long.MaxValue.toDouble).toFloat)
    val rows = (0 until 200).flatMap { i =>
      val v = vec(i)
      val twin = v.zipWithIndex.map { case (x, d) => x + ((d % 5) - 2) * 1e-5f }
      Seq((i.toLong, v), (i.toLong + 100000L, twin))
    }
    val banded = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        posexplode(VectorFunctions.lsh_bands(
          col("embedding").cast("array<float>"), dim, 8, 16, 42L))
          .as(Seq("band", "bucket")))
    val collisions = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") + 100000L === col("b.vec_id"))
      .select(col("a.vec_id")).distinct().count()
    assert(collisions == 200L,
      s"only $collisions of 200 near-identical twins collide in any band")
  }

  test("semanticDedup drops every planted near-identical twin") {
    val dim = 64
    def vec(i: Int): Seq[Float] =
      (0 until dim).map(d => (VectorOps.splitmix64(777L + i.toLong * dim + d).toDouble /
        Long.MaxValue.toDouble).toFloat)
    val rows = (0 until 100).flatMap { i =>
      val v = vec(i)
      val twin = v.zipWithIndex.map { case (x, d) => x + ((d % 3) - 1) * 1e-5f }
      Seq((i.toLong, v), (i.toLong + 100000L, twin))
    }
    val kept = graft.functions.Similarity.semanticDedup(
        rows.toDF("vec_id", "embedding"), threshold = 0.999, dim = dim,
        planesPerBand = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == (0 until 100).map(_.toLong).toSet,
      s"survivors wrong: extra=${kept.filter(_ >= 100000L)} missing=${(0 until 100).map(_.toLong).toSet -- kept}")
  }
}
