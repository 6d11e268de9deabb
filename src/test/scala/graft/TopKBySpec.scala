package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * X61 top_k_by: the bounded-heap per-group top-k aggregate must equal the
 * row_number window form it replaces (on unique ids), stay
 * partitioning-invariant, and plan with map-side partials so a hot group
 * never funnels its row stream through one task.
 */
class TopKBySpec extends SparkSpec {
  import spark.implicits._

  test("equals the row_number window form, any partitioning") {
    graft.plans.SketchFunctions.register(spark)
    val rows = (0 until 2000).map(i =>
      (s"g${i % 7}", ((i * 37) % 500).toLong, i.toLong))
    for (parts <- Seq(1, 8, 32)) {
      val df = rows.toDF("g", "score", "id").repartition(parts)
      val got = df.groupBy("g").agg(expr("top_k_by(score, id, 5)").as("ids"))
        .select(col("g"), posexplode(col("ids")).as(Seq("pos", "id")))
        .as[(String, Int, Long)].collect().toSet
      val want = df.withColumn("rnk",
          row_number().over(Window.partitionBy("g")
            .orderBy(col("score").desc, col("id"))))
        .where(col("rnk") <= 5)
        .select(col("g"), (col("rnk") - 1).cast("int"), col("id"))
        .as[(String, Int, Long)].collect().toSet
      assert(got == want, s"at $parts partitions: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("groups smaller than k return all members, best first") {
    graft.plans.SketchFunctions.register(spark)
    val df = Seq(("a", 1L, 10L), ("a", 9L, 11L), ("b", 5L, 20L)).toDF("g", "score", "id")
    val got = df.groupBy("g").agg(expr("top_k_by(score, id, 5)").as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") == Seq(11L, 10L))
    assert(got("b") == Seq(20L))
  }

  test("score ties break by ascending id — a deterministic function of the input set") {
    graft.plans.SketchFunctions.register(spark)
    val df = (0 until 100).map(i => ("g", 7L, i.toLong)).toDF("g", "score", "id")
    val got = df.repartition(16).groupBy("g").agg(expr("top_k_by(score, id, 3)").as("ids"))
      .collect()(0).getSeq[Long](1)
    assert(got == Seq(0L, 1L, 2L))
  }

  test("hot group: aggregate plans map-side partials, never a window sort") {
    graft.plans.SketchFunctions.register(spark)
    // 90% of rows in one group — the case the window form single-tasks
    val df = (0 until 5000).map(i =>
      (if (i % 10 == 0) s"cold${i % 50}" else "hot", i.toLong % 977, i.toLong))
      .toDF("g", "score", "id")
    val out = df.groupBy("g").agg(expr("top_k_by(score, id, 5)").as("ids"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object-hash aggregate:\n$plan")
    assert(plan.contains("partial_top_k_by") || plan.contains("partial top_k_by")
      || plan.split("ObjectHashAggregate").length > 2,
      s"top_k_by did not plan map-side partials:\n$plan")
    assert(!plan.contains("Window"), s"a window leaked into the top-k plan:\n$plan")
    assert(out.where(col("g") === "hot").collect()(0).getSeq[Long](1).length == 5)
  }

  test("composes with other aggregates in ONE pass: one exchange, no join, no window") {
    graft.plans.SketchFunctions.register(spark)
    val df = (0 until 3000).map(i =>
      (s"s${i % 5}", (i % 400).toLong, i.toLong)).toDF("source", "n_chars", "doc_id")
    val out = df.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        expr("hist_quantile(n_chars, 50, 16, 128)").as("p50"),
        expr("top_k_by(n_chars, doc_id, 3)").as("ids"))
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Join"), s"profile needed a join:\n$plan")
    assert(!plan.contains("Window"), s"profile fell back to a window:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"profile should shuffle exactly once:\n$plan")
    assert(out.count() == 5)
  }
}
