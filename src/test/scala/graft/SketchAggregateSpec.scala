package graft

import org.apache.spark.sql.functions._

import graft.plans.SketchFunctions

/**
 * bottom_k_md5 TypedImperativeAggregate (SURVEY §2.8) contract:
 * distinctness, bounded state, merge correctness across many partitions,
 * and exact agreement with the unbounded SQL twin.
 */
class SketchAggregateSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  test("bottom_k_md5 = k smallest distinct digests, merged across 16 partitions") {
    val values = (0 until 5000).map(i => s"tok${i % 1200}") // heavy repeats
    val df = values.toDF("v").repartition(16)
    val got = df.agg(SketchFunctions.bottom_k_md5(col("v"), 32).as("sig"))
      .collect()(0).getSeq[String](0)
    val want = values.distinct.map(md5hex).sorted.take(32)
    assert(got == want)
    assert(got.distinct.size == 32)
  }

  test("groups smaller than k return all their distinct digests, sorted") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z"))
      .toDF("g", "v").repartition(4)
    val out = df.groupBy("g").agg(SketchFunctions.bottom_k_md5(col("v"), 8).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("a") == Seq("x", "y").map(md5hex).sorted)
    assert(out("b") == Seq(md5hex("z")))
  }

  test("nulls are skipped, not hashed") {
    val df = Seq(Some("x"), None, Some("y"), None).toDF("v")
    val got = df.agg(SketchFunctions.bottom_k_md5(col("v"), 4).as("sig"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("x", "y").map(md5hex).sorted)
  }

  test("ngram_explode streams the same grams as explode(word_ngrams), with positions") {
    val docs = Seq(
      (1L, "  The quick Brown fox jumps  "),
      (2L, "one two"),          // fewer than n tokens -> no rows
      (3L, "a b c")
    ).toDF("id", "text")
    val gen = docs.select(col("id"), SketchFunctions.ngram_explode(col("text"), 3))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val arr = docs.select(col("id"),
        posexplode(SketchFunctions.word_ngrams(col("text"), 3)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(gen == arr)
    assert(gen.contains((1L, 0, "the quick brown")))
    assert(!gen.exists(_._1 == 2L))
  }

  test("ngram_explode in plain SQL via the session registry") {
    spark.range(0, 1).selectExpr("'x y z w' AS text").createOrReplaceTempView("ngtest")
    val rows = spark.sql("SELECT pos, gram FROM ngtest LATERAL VIEW ngram_explode(text, 2) t AS pos, gram")
      .collect().map(r => (r.getInt(0), r.getString(1))).toList
    assert(rows == List((0, "x y"), (1, "y z"), (2, "z w")))
  }

  test("KMV estimate tracks true Jaccard on controlled overlap") {
    // two sets sharing exactly half their elements: true J = 1/3
    val a = (0 until 600).map(i => ("a", s"e$i"))
    val b = (300 until 900).map(i => ("b", s"e$i"))
    val df = (a ++ b).toDF("g", "v").repartition(8)
    val sigs = df.groupBy("g").agg(SketchFunctions.bottom_k_md5(col("v"), 64).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val k = 64
    val union = (sigs("a") ++ sigs("b")).distinct.sorted.take(k)
    val est = union.count(h => sigs("a").contains(h) && sigs("b").contains(h)).toDouble / k
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"estimate $est too far from 1/3")
  }
}
