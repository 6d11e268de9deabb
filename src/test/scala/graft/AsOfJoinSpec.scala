package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin
import graft.plans.AsOfJoinPlans.AsOfJoinPlan

/**
 * Custom as-of join operator (LogicalPlan + Rule + SparkStrategy + SparkPlan):
 * semantics vs the window-composed EventOps.asofJoin and a hand model,
 * tolerance, null-padding, the physical plan shape (merge, not window), and
 * the probe-side-only predicate pushdown rule.
 */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def planted = Seq(
    // (user, id, time)
    ("u1", 1L, 100L), ("u1", 2L, 200L), ("u1", 3L, 200L), ("u1", 4L, 500L),
    ("u2", 5L, 50L),
    ("u3", 6L, 10L)
  ).toDF("user_id", "event_id", "us")

  private def probes = Seq(
    ("u1", 10L, 250L), // latest view <= 250 is t=200; tie → highest id 3
    ("u1", 11L, 99L),  // before all views → null
    ("u2", 12L, 50L),  // exact tie at 50 (at-or-before includes ties) → 5
    ("u4", 13L, 999L)  // user with no views → null
  ).toDF("user_id", "event_id", "us")

  test("matches the hand model: latest at-or-before, ties to highest id, null when none") {
    val out = AsOfJoin.asofJoin(probes, planted, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id"))
      .select(col("event_id"), col("event_id_r"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(10L -> 3L, 11L -> -1L, 12L -> 5L, 13L -> -1L))
  }

  test("null keys never match — SQL equi-join semantics, not natural-ordering NULL == NULL") {
    // null-keyed reference rows sort FIRST within a partition; without the
    // advance-skip the merge's natural ordering treats NULL == NULL and a
    // null-keyed probe would take a null-keyed reference as its match
    val ref = Seq(
      (Option("u1"), 1L, 100L), (Option.empty[String], 2L, 100L),
      (Option.empty[String], 3L, 150L)
    ).toDF("user_id", "event_id", "us")
    val prb = Seq(
      (Option("u1"), 10L, 200L),      // matches id 1 — null refs must not shadow
      (Option.empty[String], 11L, 200L), // null probe key → NO match ever
      (Option("u9"), 12L, 200L)       // unseen key → null
    ).toDF("user_id", "event_id", "us")
    val out = AsOfJoin.asofJoin(prb, ref, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id"))
      .select(col("event_id"), col("event_id_r"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(10L -> 1L, 11L -> -1L, 12L -> -1L),
      s"null-key semantics diverged: $out")
    // same truth as a SQL window-over-equi-join formulation (NULL never joins)
    val sqlTruth = prb.as("p").join(ref.as("r"),
        col("p.user_id") === col("r.user_id") && col("r.us") <= col("p.us"), "left_outer")
      .groupBy(col("p.event_id"))
      .agg(max(struct(col("r.us"), col("r.event_id"))).as("m"))
      .select(col("p.event_id"), col("m.event_id").as("match_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == sqlTruth)
  }

  test("forward direction: earliest at-or-after, ties to the LOWEST id, tolerance bounds ref - probe") {
    val fwd = AsOfJoin.asofJoin(probes, planted, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id"), direction = "forward")
      .select(col("event_id"), col("event_id_r"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // probe 10 @250 → next view at 500 (id 4); probe 11 @99 → 100 (id 1);
    // probe 12 @50 → tie at 50 (at-or-after includes ties) → id 5;
    // probe 13 user u4 → null
    assert(fwd == Map(10L -> 4L, 11L -> 1L, 12L -> 5L, 13L -> -1L))
    // forward TIE within equal times picks the LOWEST id: u1 has ids 2 AND 3
    // at t=200 — a probe at 150 must take id 2 (backward at 250 takes 3)
    val fwdTie = AsOfJoin.asofJoin(
        Seq(("u1", 20L, 150L)).toDF("user_id", "event_id", "us"),
        planted, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id"), direction = "forward")
      .select(col("event_id_r")).head().getLong(0)
    assert(fwdTie == 2L)
    // tolerance bounds refTime - probeTime in the forward direction
    val tol = AsOfJoin.asofJoin(probes, planted, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id"), tolerance = Some(10L), direction = "forward")
      .select(col("event_id"), col("event_id_r"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // probe 10: next at 500 is 250 > 10 away → null; probe 11: 100-99=1 ≤ 10 → 1
    assert(tol == Map(10L -> -1L, 11L -> 1L, 12L -> 5L, 13L -> -1L))
    // non-integral tiebreak is rejected up front in forward mode
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(probes,
        planted.withColumn("tag", col("event_id").cast("string")),
        Seq("user_id"), "us", "us", tieBreakCols = Seq("tag"), direction = "forward")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("tolerance drops stale matches") {
    val out = AsOfJoin.asofJoin(probes, planted, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id"), tolerance = Some(10L))
      .select(col("event_id"), col("event_id_r"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // probe 10 at 250: candidate at 200 is 50 > 10 stale → null; probe 12 gap 0 → keeps 5
    assert(out == Map(10L -> -1L, 11L -> -1L, 12L -> 5L, 13L -> -1L))
  }

  test("agrees with the window-composed EventOps.asofJoin on the fixture events") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.functions.EventOps.withTsUs(spark.read.parquet(s"$dir/events.parquet"))
      .withColumn("us", col("ts_us"))
    val views = e.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("us"))
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("us"))
    val composed = graft.functions.EventOps.asofJoin(views, purchases)
      .select(col("event_id"), col("asof_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val exec = AsOfJoin.asofJoin(purchases, views, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id"))
      .select(col("event_id"), col("event_id_r"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(exec == composed)
    assert(exec.nonEmpty)
  }

  test("physical plan is the merge exec: one exchange per side, no Window, no CartesianProduct") {
    val out = AsOfJoin.asofJoin(probes, planted, Seq("user_id"), "us", "us")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin "), plan) // SparkPlan.nodeName strips "Exec"
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("column pruning reaches the reference scan: unused wide columns never leave parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-asof-wide").toString
    planted
      .withColumn("wide_payload", concat(lit("x"), col("event_id")))
      .withColumn("wide_extra", col("us") * 2)
      .write.mode("overwrite").parquet(dir)
    val wideRef = spark.read.parquet(dir)
    val out = AsOfJoin.asofJoin(probes, wideRef, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id"))
      .select(col("event_id"), col("event_id_r")) // wide_* never referenced
    out.collect()
    val scan = out.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]*".r.findAllIn(scan).mkString("\n")
    assert(readSchema.nonEmpty && !readSchema.contains("wide_payload") &&
      !readSchema.contains("wide_extra"),
      s"wide columns not pruned at the scan:\n$scan")
  }

  test("probe-side filters push below the join; reference-side filters do not") {
    val joinedDf = AsOfJoin.asofJoin(probes, planted, Seq("user_id"), "us", "us")
    val probeFiltered = joinedDf.where(col("event_id") === 10L)
    val opt = probeFiltered.queryExecution.optimizedPlan
    // after pushdown the AsOfJoinPlan's left subtree carries the condition
    val asof = opt.collectFirst { case a: AsOfJoinPlan => a }.get
    assert(asof.left.toString.contains("event_id"),
      s"probe filter not pushed into left subtree:\n$opt")
    assert(!opt.toString.startsWith("Filter"), s"filter should be consumed:\n$opt")

    val refFiltered = joinedDf.where(col("event_id_r") === 3L)
    val opt2 = refFiltered.queryExecution.optimizedPlan
    val hasTopFilter = opt2.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[AsOfJoinPlan] => f
    }.isDefined
    assert(hasTopFilter, s"reference-side filter must stay above the join:\n$opt2")
  }
}
