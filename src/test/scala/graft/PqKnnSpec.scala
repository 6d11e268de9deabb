package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.plans.{VectorFunctions, VectorOps}

/**
 * Product-quantization (X32) and kNN-join (X33) specs: losslessness when the
 * corpus IS the codebook vocabulary, shortlist recall at the shipped
 * e_pq_topk config on a fixture-shaped corpus, codebook determinism, and the
 * WindowGroupLimit partial-top-k plan shape for the kNN join.
 */
class PqKnnSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** Deterministic fixture-shaped corpus: n vectors of `dim` floats in
    * [-1, 1] from the shared splitmix64 stream. */
  private def randCorpus(n: Int, seed: Long = 7L) =
    (0 until n).map { id =>
      val v = Array.tabulate(dim) { d =>
        (VectorOps.splitmix64(VectorOps.splitmix64(seed + id) + d).toDouble /
          Long.MaxValue.toDouble).toFloat
      }
      (id.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")

  /** Corpus drawn from a SMALL per-subspace vocabulary: every subvector is
    * one of 4 patterns, so a K=16 codebook can represent each subvector
    * exactly and PQ becomes lossless by construction. */
  private def vocabCorpus(n: Int) = {
    val ds = 8
    val patterns = Array.tabulate(4, ds)((p, i) => (p * 0.25f + i * 0.01f))
    (0 until n).map { id =>
      val v = Array.tabulate(dim) { d =>
        patterns((VectorOps.splitmix64(id.toLong * 8 + d / ds) % 4).toInt.abs)(d % ds)
      }
      (id.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pq encode/decode is lossless when subvectors come from a small vocabulary") {
    val corpus = vocabCorpus(60)
    val books = Similarity.pqCodebooks(corpus, dim, nSub = 8, k = 16, iters = 4, poolSize = 60)
    val rt = corpus
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.pq_decode(
          VectorFunctions.pq_encode(col("embedding").cast("array<float>"), books), books).as("decoded"))
      .select(col("vec_id"), (col("embedding").cast("array<float>") === col("decoded")).as("eq"))
      .as[(Long, Boolean)].collect()
    assert(rt.forall(_._2), s"lossy rows: ${rt.filterNot(_._2).map(_._1).toSeq}")
  }

  test("ADC cosine equals exact cosine under a lossless codebook") {
    val corpus = vocabCorpus(60)
    val books = Similarity.pqCodebooks(corpus, dim, nSub = 8, k = 16, iters = 4, poolSize = 60)
    val q = corpus.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<float>")).head().getSeq[Float](0).toArray
    val qLit = array(q.toSeq.map(lit(_)): _*).cast("array<float>")
    val rows = Similarity.withPqCodes(corpus, books)
      .select(col("vec_id"),
        round(VectorFunctions.pq_adc(col("pq"), q, books), 6).as("adc"),
        round(Similarity.cosine(col("embedding"), qLit), 6).as("exact"))
      .as[(Long, Double, Double)].collect()
    rows.foreach { case (id, adc, exact) =>
      assert(adc == exact, s"vec $id: adc $adc != exact $exact")
    }
  }

  test("pqTopK at the shipped config returns the exact brute-force top-10") {
    val corpus = randCorpus(500)
    val q = corpus.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val pq = Similarity.pqTopK(corpus.where(col("vec_id") =!= 0), q, k = 10,
      dim = dim, nSub = 8, codebookSize = 16, shortlist = 256)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val bf = Similarity.bruteForceTopK(corpus.where(col("vec_id") =!= 0), q, k = 10)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    assert(pq == bf)
  }

  test("pqTopK with shortlist = corpus degenerates to exact brute force") {
    val corpus = randCorpus(120, seed = 99L)
    val q = corpus.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val pq = Similarity.pqTopK(corpus.where(col("vec_id") =!= 0), q, k = 7,
      dim = dim, nSub = 8, codebookSize = 8, shortlist = 119)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    val bf = Similarity.bruteForceTopK(corpus.where(col("vec_id") =!= 0), q, k = 7)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
    assert(pq == bf)
  }

  test("pqCodebooks is deterministic across calls") {
    val corpus = randCorpus(200)
    val a = Similarity.pqCodebooks(corpus, dim, nSub = 8, k = 16)
    val b = Similarity.pqCodebooks(corpus, dim, nSub = 8, k = 16)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("knnJoin matches per-query brute force and excludes self-matches") {
    val corpus = randCorpus(150)
    val queries = corpus.where(col("vec_id") < 8)
    val joined = Similarity.knnJoin(corpus, queries, k = 4)
      .select("q_id", "vec_id", "rank").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    (0L until 8L).foreach { qid =>
      val qv = corpus.where(col("vec_id") === qid)
        .select(col("embedding")).head().getSeq[Float](0)
      val bf = Similarity.bruteForceTopK(corpus, qv, k = 4, excludeIds = Seq(qid))
        .select("vec_id").as[Long].collect().toSeq
      assert(joined(qid) == bf, s"query $qid: ${joined(qid)} != $bf")
      assert(!joined(qid).contains(qid), s"query $qid matched itself")
    }
  }

  test("knnJoin plans a WindowGroupLimit partial top-k below the exchange") {
    val corpus = randCorpus(64)
    val plan = Similarity.knnJoin(corpus, corpus.where(col("vec_id") < 4), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side not broadcast in:\n$plan")
  }
}
