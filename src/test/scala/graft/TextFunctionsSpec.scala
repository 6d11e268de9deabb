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
}
