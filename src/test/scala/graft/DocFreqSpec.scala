package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextFunctions}

/**
 * X65 corpus document-frequency plane (round-12 directive #7): one (tok, df)
 * aggregation shared by every df consumer. Pins (a) the plane's values,
 * (b) consumer equivalence — ppjoinPairs and bm25TopK return identical
 * results whether they compute df inline or consume the shared plane, and
 * (c) the read-once contract — with a persisted plane, BOTH consumers' plans
 * read InMemoryTableScan instead of re-scanning and re-tokenizing the
 * corpus.
 */
class DocFreqSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the log"),
    (2L, "a cat and a dog"),
    (3L, "the cat sat on the mat"), // exact dup of 0
    (4L, "entirely different words here")).toDF("doc_id", "text")

  test("df values: per-doc distinct, corpus-wide count") {
    val got = TextFunctions.corpusDocFreq(corpus, n = 1)
      .as[(String, Long)].collect().toMap
    assert(got("the") == 3)   // docs 0,1,3 — twice each, counted once
    assert(got("cat") == 3)   // docs 0,2,3
    assert(got("dog") == 2)
    assert(got("a") == 1)     // doc 2 only, twice in it
    assert(got("entirely") == 1)
    assert(got.values.sum == corpus.select(
      explode(array_distinct(split(trim(lower(col("text"))), "\\s+"))))
      .count())
  }

  test("ppjoinPairs: shared plane equals inline df (n = 3)") {
    val plane = TextFunctions.corpusDocFreq(corpus, n = 3)
    val inline = Dedup.ppjoinPairs(corpus, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val shared = Dedup.ppjoinPairs(corpus, threshold = 0.5, docFreq = Some(plane))
      .as[(Long, Long, Double)].collect().toSet
    assert(inline == shared)
    assert(inline.map(p => (p._1, p._2)) == Set((0L, 3L))) // the planted dup
  }

  test("bm25TopK: shared plane equals inline df (n = 1)") {
    val queries = Seq(("q1", "cat mat"), ("q2", "dog words")).toDF("query_id", "query")
    val plane = TextFunctions.corpusDocFreq(corpus, n = 1)
    val inline = TextFunctions.bm25TopK(corpus, queries, k = 5)
      .collect().map(_.toSeq).toSet
    val shared = TextFunctions.bm25TopK(corpus, queries, k = 5, docFreq = Some(plane))
      .collect().map(_.toSeq).toSet
    assert(inline == shared)
    assert(inline.nonEmpty)
  }

  test("read-once: persisted plane serves both consumers from cache") {
    val plane = TextFunctions.corpusDocFreq(corpus, n = 1, persist = true)
    try {
      plane.count() // materialize the cache
      val bmPlan = TextFunctions.bm25TopK(corpus,
          Seq(("q1", "cat mat")).toDF("query_id", "query"), k = 5,
          docFreq = Some(plane))
        .queryExecution.executedPlan.toString
      val swPlan = plane.where(col("df") >= 3)
        .queryExecution.executedPlan.toString
      assert(bmPlan.contains("InMemoryTableScan"), bmPlan)
      assert(swPlan.contains("InMemoryTableScan"), swPlan)
    } finally plane.unpersist()
  }
}
