package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/**
 * X64 SemDeDup (round-12 directive #4): cluster-then-prune-within-cluster
 * embedding dedup. The contract under test: (a) cross-cluster pairs are
 * NEVER enumerated — behaviorally (an adversarial near-dup pair split
 * across a Voronoi boundary is not reported) and at the plan level (the
 * pair plane is a hash equi-join on ivf_cell, no cartesian); (b) identical
 * vectors always co-cluster, so exact-duplicate recall is structural;
 * (c) end-to-end survivors equal the all-pairs truth when all near-dup
 * pairs are within-cluster.
 */
class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("cross-cluster pairs are never enumerated (adversarial boundary pair)") {
    // v1 ≈ v2 with cosine ≥ 0.999 but centroids chosen so they land in
    // DIFFERENT cells; v3 = exact copy of v1 (same cell, must pair)
    val eps = 0.02
    val rows = Seq(
      (1L, vec(1.0, eps)), (2L, vec(1.0, -eps)), (3L, vec(1.0, eps)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Array(Array(0.7f, 0.7141f), Array(0.7f, -0.7141f)) // ±45°
    val cos12 = {
      val (a, b) = (rows(0)._2, rows(1)._2)
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    assert(cos12 >= 0.999, s"fixture broken: cos(v1,v2)=$cos12")
    val pairs = Similarity.semDeDupPairs(df, cents, 0.999)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // (1,2) straddles the boundary → never enumerated; (1,3) co-clusters
    assert(got == Set((1L, 3L)), s"got $got")
  }

  test("pair plane is a hash equi-join on ivf_cell — no cartesian product") {
    val df = (0L until 64L).map(i => (i, vec(math.cos(i / 10.0), math.sin(i / 10.0))))
      .toDF("vec_id", "embedding")
    val cents = Array(Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f), Array(0f, -1f))
    val plan = Similarity.semDeDupPairs(df, cents, 0.9)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ivf_cell"), plan)
  }

  test("identical vectors co-cluster and dedup keeps the lowest id") {
    val base = (0L until 40L).map { i =>
      (i, vec(math.cos(i / 5.0), math.sin(i / 5.0), (i % 7) / 7.0, 1.0))
    }
    val dups = base.filter(_._1 % 4 == 0).map { case (i, v) => (i + 1000L, v) }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val out = Similarity.semDeDup(df, threshold = 0.9999999, dim = 4, nCentroids = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(out == base.map(_._1).toSet,
      s"extra=${out -- base.map(_._1)} missing=${base.map(_._1).toSet -- out}")
  }

  test("shipped quantizer scales with the corpus: k grows with N, cells stay bounded") {
    // the scaling law itself: k = max(16, ceil(N / targetCellSize)) — fixed
    // k would make the within-cell pair plane N²/k (quadratic); scaled k
    // keeps expected |cell| (and the per-cell pair fan-out) CONSTANT
    assert(Similarity.semDeDupK(500) == 16)
    assert(Similarity.semDeDupK(22857) == 90)
    assert(Similarity.semDeDupK(1000000) == 3907)
    val ks = Seq(1000L, 10000L, 100000L, 1000000L).map(Similarity.semDeDupK(_))
    assert(ks == ks.sorted && ks.distinct.size >= 3, s"k must grow with N: $ks")
    Seq(10000L, 1000000L, 100000000L).foreach { n =>
      val cell = n.toDouble / Similarity.semDeDupK(n)
      assert(cell <= 256.0 + 1e-9, s"expected cell size $cell at N=$n")
    }
  }

  test("semDeDupScaled: planted recall stays structural under the derived k") {
    // 600 vectors → k = 16 via the same derivation the shipped query uses;
    // planted exact copies must vanish, everything else survives
    val base = (0L until 600L).map { i =>
      (i, vec(math.cos(i / 9.0), math.sin(i / 9.0), (i % 11) / 11.0, 1.0))
    }
    val dups = base.filter(_._1 % 6 == 0).map { case (i, v) => (i + 100000L, v) }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val out = Similarity.semDeDupScaled(df, threshold = 0.9999999, dim = 4)
      .select("vec_id").as[Long].collect().toSet
    assert(out == base.map(_._1).toSet,
      s"extra=${out -- base.map(_._1)} missing=${base.map(_._1).toSet -- out}")
  }

  test("fixture invariant the e_semdedup oracle rests on: no natural near-1 pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val withCells = Similarity.exactNearDupPairs(e, threshold = 0.999)
    assert(withCells.count() == 0L,
      "fixture now has natural >=0.999 pairs — e_semdedup's all-pairs oracle " +
        "is no longer guaranteed to equal the within-cluster pruning; revisit")
  }
}
