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

  // ----------------------------------------------------- hll_md5 (X47)

  /** Reference HLL: the exact algorithm the aggregate implements, rebuilt
    * independently here from the 48-bit md5 draw. */
  private def hllRef(values: Seq[String], p: Int = 8): Double = {
    val m = 1 << p
    val restBits = 48 - p
    val regs = new Array[Int](m)
    values.distinct.foreach { v =>
      val hash = java.lang.Long.parseLong(md5hex(v).substring(0, 12), 16)
      val j = (hash >>> restBits).toInt
      val rest = hash & ((1L << restBits) - 1)
      val rho = if (rest == 0L) restBits + 1
        else restBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > regs(j)) regs(j) = rho
    }
    val z = regs.map(r => 1.0 / (1L << r).toDouble).sum
    val v0 = regs.count(_ == 0)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val e = alpha * m * m / z
    val corrected = if (e <= 2.5 * m && v0 > 0) m * math.log(m.toDouble / v0) else e
    math.rint(corrected * 1e4) / 1e4
  }

  private def hllEst(df: org.apache.spark.sql.DataFrame): Double =
    df.agg(SketchFunctions.hll_md5(col("v"), 8).as("e")).collect()(0).getDouble(0)

  test("hll_md5 is partition-invariant (merge = elementwise max) and matches the reference") {
    val values = (0 until 5000).map(i => s"token$i")
    val one = hllEst(values.toDF("v").coalesce(1))
    val many = hllEst(values.toDF("v").repartition(16))
    assert(one == many, s"merge changed the estimate: $one vs $many")
    assert(one == hllRef(values), s"aggregate $one != reference ${hllRef(values)}")
    // 5k distinct at p=8 runs the RAW estimator branch; std err 1.04/sqrt(256)
    assert(math.abs(one - 5000) / 5000 < 0.15, s"estimate $one too far from 5000")
  }

  test("duplicates and nulls do not move the estimate (set semantics)") {
    val base = (0 until 400).map(i => s"w$i")
    val noisy = (base ++ base ++ base).map(Option(_)) ++ Seq(None, None)
    assert(hllEst(noisy.toDF("v")) == hllEst(base.toDF("v")))
  }

  test("small groups take the linear-counting branch exactly") {
    val values = (0 until 10).map(i => s"rare$i")
    val est = hllEst(values.toDF("v").repartition(4))
    assert(est == hllRef(values))
    // at 10 distinct the correction must fire: estimate lands near truth
    assert(math.abs(est - 10) < 1.0, s"linear counting gave $est for 10 distinct")
  }

  // ----------------------------------------------------- cms_md5 (X51)

  /** Reference CMS sketch: the exact algorithm the aggregate implements. */
  private def cmsRef(values: Seq[String], d: Int, w: Int): Array[Long] = {
    val buf = new Array[Long](d * w)
    values.foreach { v =>
      (0 until d).foreach { i =>
        val hash = java.lang.Long.parseLong(md5hex(s"$i:$v").substring(0, 12), 16)
        buf(i * w + (hash % w).toInt) += 1L
      }
    }
    buf
  }

  private def cmsEst(sketch: Seq[Long], key: String, d: Int, w: Int): Long =
    (0 until d).map { i =>
      val hash = java.lang.Long.parseLong(md5hex(s"$i:$key").substring(0, 12), 16)
      sketch(i * w + (hash % w).toInt)
    }.min

  test("cms_md5 is partition-invariant (merge = elementwise sum) and matches the reference") {
    val values = (0 until 4000).map(i => s"tok${i % 37}") // skewed multiset
    val one = values.toDF("v").coalesce(1)
      .agg(SketchFunctions.cms_md5(col("v"), 4, 16).as("s"))
      .collect()(0).getSeq[Long](0)
    val many = values.toDF("v").repartition(16)
      .agg(SketchFunctions.cms_md5(col("v"), 4, 16).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(one == many, "merge changed the sketch")
    assert(one == cmsRef(values, 4, 16).toSeq, "sketch differs from reference")
    // conservation: every row of counters sums to the stream length
    (0 until 4).foreach { i =>
      assert(one.slice(i * 16, (i + 1) * 16).sum == values.length.toLong)
    }
  }

  test("cms point estimates dominate exact counts; collisions only overestimate") {
    val values = (0 until 4000).map(i => s"tok${i % 37}")
    val sketch = values.toDF("v").repartition(8)
      .agg(SketchFunctions.cms_md5(col("v"), 4, 16).as("s"))
      .collect()(0).getSeq[Long](0)
    val exact = values.groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    exact.foreach { case (k, n) =>
      val est = cmsEst(sketch, k, 4, 16)
      assert(est >= n, s"CMS underestimated $k: $est < $n")
    }
    // an absent key estimates only its collision mass — bounded well below
    // the hottest real key at this load factor
    assert(cmsEst(sketch, "never-seen", 4, 16) < exact.values.max)
  }

  test("cms_md5 nulls are skipped and per-group SQL registry use works") {
    Seq(("a", Some("x")), ("a", None), ("a", Some("x")), ("b", Some("y")))
      .toDF("g", "v").createOrReplaceTempView("cmstest")
    val rows = spark.sql("SELECT g, cms_md5(v, 2, 8) AS s FROM cmstest GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("a").sum == 4L, "two non-null rows x two hash rows")
    assert(rows("b").sum == 2L)
    assert(rows("a") == cmsRef(Seq("x", "x"), 2, 8).toSeq)
  }

  test("hll_md5 per-group in plain SQL via the session registry") {
    (0 until 300).map(i => (s"g${i % 2}", s"v${i % (if (i % 2 == 0) 30 else 120)}"))
      .toDF("g", "v").createOrReplaceTempView("hlltest")
    val rows = spark.sql("SELECT g, hll_md5(v, 8) AS e FROM hlltest GROUP BY g")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.size == 2 && rows.values.forall(_ > 0))
    assert(rows("g1") > rows("g0"), s"120-distinct group must estimate above 30-distinct: $rows")
  }
}
