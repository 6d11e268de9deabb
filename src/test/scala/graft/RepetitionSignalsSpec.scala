package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * X66 Gopher repetition rules: hand-computed truths on crafted documents,
 * the planted self-concatenation flip, and the shuffle-free plan contract.
 */
class RepetitionSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def signals(rows: (Long, String)*): Map[Long, (Long, Double, Double, Double, Boolean)] =
    TextFunctions.repetitionSignals(rows.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap

  test("hand truths: clean doc, doubled doc, hot bigram") {
    val clean = (1 to 30).map(i => s"w$i").mkString(" ")
    val m = signals(
      (1L, clean),                       // all tokens distinct
      (2L, clean + " " + clean),         // doubled: 5-gram dups ~ half
      (3L, "a b a b a b a b a b a b"))   // one bigram dominates
    // doc 1: 30 tokens, 3 chunks all distinct, no repeated bigram/5-gram
    assert(m(1L) == ((30L, 0.0, round6(2.0 / 30), 0.0, true)))
    // doc 2: 60 tokens; sliding 5-grams: 56 total, 30 distinct (the 26
    // interior repeats collapse plus the 4 boundary-crossing ones are new)
    val (n2, _, _, dup5, keep2) = m(2L)
    assert(n2 == 60 && dup5 > 0.4 && !keep2, m(2L))
    // doc 3: 12 tokens; "a b" occurs 6 times, "b a" 5 → top2 = 6,
    // coverage 12/12 = 1.0 → fails the 0.2 gate
    val (_, _, topb, _, keep3) = m(3L)
    assert(topb == 1.0 && !keep3, m(3L))
  }

  private def round6(x: Double): Double = math.round(x * 1e6) / 1e6

  test("chunk duplication: aligned repeated paragraph trips the chunk rule") {
    val para = (1 to 10).map(i => s"p$i").mkString(" ")
    val doc = Seq(para, para, para, para).mkString(" ") // 4 identical chunks
    val (_, dupChunk, _, _, keep) = signals((1L, doc))(1L)
    assert(dupChunk == 0.75 && !keep)
  }

  test("short docs: no bigrams/5-grams means zero fractions, kept") {
    val m = signals((1L, "solo"), (2L, "two words"), (3L, "a b c d"))
    assert(m(1L) == ((1L, 0.0, 0.0, 0.0, true)))
    assert(m(2L) == ((2L, 0.0, 1.0, 0.0, false))) // "two words" bigram covers all
    val (_, _, _, d5, _) = m(3L)
    assert(d5 == 0.0) // 4 tokens < 5: the 5-gram branch is empty
  }

  test("plan is one Exchange-free codegen'd projection") {
    val df = TextFunctions.repetitionSignals(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition signals shuffle:\n$plan")
    assert(plan.contains("*(1)"), s"fell out of codegen:\n$plan")
  }
}
