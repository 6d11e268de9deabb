package graft

import org.apache.spark.sql.functions._

/**
 * X60 hist_quantile: mergeable fixed-grid histogram quantile sketch.
 * The estimate must equal the scala reference model on ANY partitioning
 * (merge = elementwise sum is exact), carry the |est − exact| < width
 * bound, clamp out-of-grid values, and plan with map-side partials.
 */
class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  // reference model: the aggregate's documented integer rule
  private def model(vals: Seq[Long], p100: Int, width: Int, buckets: Int): Option[Long] = {
    if (vals.isEmpty) None
    else {
      val h = new Array[Long](buckets)
      vals.foreach { x =>
        val b = if (x < 0) 0 else math.min(x / width, (buckets - 1).toLong).toInt
        h(b) += 1
      }
      val total = vals.length.toLong
      var cum = 0L
      (0 until buckets).collectFirst {
        case b if { cum += h(b); 100L * cum >= p100.toLong * total } =>
          (b + 1).toLong * width - 1L
      }
    }
  }

  test("equals the model and is partition-invariant") {
    graft.plans.SketchFunctions.register(spark)
    val vals = (0 until 1000).map(i => ((i * 37) % 400).toLong)
    for (parts <- Seq(1, 7, 32)) {
      val got = vals.toDF("n").repartition(parts)
        .agg(expr("hist_quantile(n, 50, 4, 128)"), expr("hist_quantile(n, 90, 4, 128)"),
          expr("hist_quantile(n, 99, 4, 128)")).collect()(0)
      assert(got.getLong(0) == model(vals, 50, 4, 128).get, s"p50 at $parts parts")
      assert(got.getLong(1) == model(vals, 90, 4, 128).get, s"p90 at $parts parts")
      assert(got.getLong(2) == model(vals, 99, 4, 128).get, s"p99 at $parts parts")
    }
  }

  test("estimate is within width of the exact percentile") {
    graft.plans.SketchFunctions.register(spark)
    val vals = (0 until 500).map(i => ((i * 13 + 7) % 300).toLong)
    val df = vals.toDF("n")
    for (p <- Seq(50, 90, 99)) {
      val est = df.agg(expr(s"hist_quantile(n, $p, 4, 128)")).collect()(0).getLong(0)
      // exact rank-p statistic under the same ceil(p·n/100) rank definition
      val exact = vals.sorted.apply((math.ceil(p * vals.length / 100.0) - 1).toInt)
      assert(est >= exact && est - exact < 4, s"p$p: est $est exact $exact")
    }
  }

  test("out-of-grid values clamp: negatives to bucket 0, overflow to the last edge") {
    graft.plans.SketchFunctions.register(spark)
    val df = Seq(-5L, -1L, 2L, 1000000L).toDF("n")
    val lo = df.agg(expr("hist_quantile(n, 50, 4, 128)")).collect()(0).getLong(0)
    assert(lo == 3L, s"p50 of two clamped-low + one small value: $lo") // bucket 0 edge
    val hi = df.agg(expr("hist_quantile(n, 99, 4, 128)")).collect()(0).getLong(0)
    assert(hi == 128L * 4 - 1, s"overflow must clamp to the last edge: $hi")
  }

  test("empty group yields null, grouped sketches stay per-group") {
    graft.plans.SketchFunctions.register(spark)
    val df = Seq(("a", 10L), ("a", 20L), ("b", 100L)).toDF("g", "n")
    val rows = df.groupBy("g").agg(expr("hist_quantile(n, 50, 4, 128)").as("q"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("a") == model(Seq(10L, 20L), 50, 4, 128).get)
    assert(rows("b") == model(Seq(100L), 50, 4, 128).get)
    val empty = df.where(col("n") > 1000).agg(expr("hist_quantile(n, 50, 4, 128)"))
      .collect()(0)
    assert(empty.isNullAt(0))
  }

  test("hist_quantile plans map-side partials (bounded exchange)") {
    graft.plans.SketchFunctions.register(spark)
    val df = (0 until 500).map(i => (s"src${i % 4}", (i % 97).toLong)).toDF("source", "n")
    val plan = df.groupBy("source").agg(expr("hist_quantile(n, 50, 4, 128)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object-hash aggregate:\n$plan")
    assert(plan.contains("partial_hist_quantile") || plan.contains("partial hist_quantile")
      || plan.split("ObjectHashAggregate").length > 2,
      s"hist_quantile did not plan map-side partials:\n$plan")
  }
}
