package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.plans.{LayoutFunctions, LayoutOps}

/**
 * Z-order layout (plans/LayoutExpressions.scala): Morton-code correctness
 * and the measured claim — a 2-D box predicate over the z-ordered layout
 * materializes far fewer rows from the parquet reader than the same
 * predicate over a time-sorted layout, because row-group stats are tight
 * in BOTH dimensions.
 */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 interleaves bits (reference model) and preserves box locality") {
    def model(a: Long, b: Long): Long = {
      var out = 0L
      for (i <- 0 until 31) {
        out |= ((a >> i) & 1L) << (2 * i)
        out |= ((b >> i) & 1L) << (2 * i + 1)
      }
      out
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 67890L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (-1L, 2L)) // negative clamps to low bits
    for ((a, b) <- samples)
      assert(LayoutOps.zorder2(a, b) == model(a & 0x7FFFFFFFL, b & 0x7FFFFFFFL), s"($a, $b)")
    // monotone in each dim when the other is fixed (prefix property)
    assert(LayoutOps.zorder2(5, 9) < LayoutOps.zorder2(6, 9))
    assert(LayoutOps.zorder2(5, 9) < LayoutOps.zorder2(5, 10))
  }

  test("native expression equals the scala model over a column") {
    val df = spark.range(1000).select(col("id").as("a"), (col("id") * 7 % 997).as("b"))
    val bad = df.select(col("a"), col("b"),
        LayoutFunctions.zorder2(col("a"), col("b")).as("z"))
      .collect().filterNot(r => r.getLong(2) == LayoutOps.zorder2(r.getLong(0), r.getLong(1)))
    assert(bad.isEmpty)
  }

  test("SQL zorder2 over INT columns coerces uniformly: codegen, interpreted fold, and scala model agree") {
    graft.plans.SketchFunctions.register(spark)
    // int (not bigint) columns: ImplicitCastInputTypes must insert the
    // int→bigint casts at analysis so interpreted eval (constant folding /
    // codegen fallback) and codegen agree — before the fix codegen silently
    // widened while interpreted eval threw ClassCastException
    val viaCols = spark.range(100)
      .select(col("id").cast("int").as("a"), (col("id") % 7).cast("int").as("b"))
      .selectExpr("a", "b", "zorder2(a, b) AS z")
      .collect()
    viaCols.foreach(r => assert(r.getLong(2) ==
      LayoutOps.zorder2(r.getInt(0).toLong, r.getInt(1).toLong)))
    // literal ints → constant-folded on the INTERPRETED path at analysis
    val folded = spark.sql("SELECT zorder2(5, 9) AS z").head().getLong(0)
    assert(folded == LayoutOps.zorder2(5L, 9L))
    // non-integral input now fails at ANALYSIS, not at runtime
    val e = intercept[Exception](spark.sql("SELECT zorder2('x', 1)").collect())
    assert(e.getMessage.toLowerCase.contains("zorder2") ||
      e.getMessage.contains("DATATYPE_MISMATCH") || e.getMessage.contains("CAST"))
  }

  test("ev_zorder_box pushes BOTH box predicates into the layout scan") {
    val q = SparkEntry.queries("ev_zorder_box")(spark, "/root/testdata/sf0.001")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: [^\\n]*".r.findAllIn(plan).mkString("\n")
    assert(pushed.contains("user_id") && pushed.contains("ts_us"),
      s"box predicates not pushed to the z-ordered scan:\n$plan")
  }

  test("2-D box over z-ordered layout materializes fewer rows than over time-sorted layout") {
    // synthetic grid: 200k events, 1024 users x ~uniform times
    val n = 200000L
    val ev = spark.range(n).select(
      pmod(hash(col("id")), lit(1024)).cast("long").as("user_id"),
      (col("id") * 437L % 2592000L).as("rel_s"), // 30 days of seconds
      col("id").as("event_id"))
    val zdir = java.nio.file.Files.createTempDirectory("graft-ztest").toString
    val ldir = java.nio.file.Files.createTempDirectory("graft-ltest").toString
    // normalize both dims to the SAME bit width before interleaving (10
    // bits each here) — raw rel_s spans 22 bits vs user's 10, and a Morton
    // code over mismatched widths degenerates to a rel_s-major sort (the
    // extra high bits all belong to one dimension), which prunes no better
    // than the linear layout
    ev.withColumn("zkey", LayoutFunctions.zorder2(col("user_id"),
        (col("rel_s") / 2536L).cast("long")))
      .repartitionByRange(32, col("zkey")).sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(zdir)
    ev.repartitionByRange(32, col("rel_s")).sortWithinPartitions(col("rel_s"))
      .write.mode("overwrite").parquet(ldir)

    // box: narrow user band, half the time range — the shape a time-sorted
    // layout cannot prune on the user axis
    // AQE wraps scans inside QueryStageExec leaves where collect() cannot
    // reach the metrics; the measurement does not need AQE
    def scanRows(dir: String): Long = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.read.parquet(dir)
          .where(col("user_id").between(100, 131) &&
            col("rel_s").between(600000L, 1900000L))
          .agg(count(lit(1)))
        df.collect()
        df.queryExecution.executedPlan.collectLeaves()
          .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }.sum
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val zRows = scanRows(zdir)
    val lRows = scanRows(ldir)
    // identical answers first
    def answer(dir: String) = spark.read.parquet(dir)
      .where(col("user_id").between(100, 131) && col("rel_s").between(600000L, 1900000L))
      .agg(count(lit(1)), sum(col("event_id"))).collect()(0).toSeq
    assert(answer(zdir) == answer(ldir))
    // the measured pruning claim: z-order materializes at most 2/3 of the
    // rows the time-sorted layout does on a both-dims box. The exact ratio
    // is fixture-dependent (parquet row-group boundaries move when the
    // driver regenerates testdata each round — observed 0.42..0.55 across
    // rounds), so the bound asserts a real margin, not a point estimate.
    assert(zRows * 3 < lRows * 2, s"zorder scan rows $zRows vs linear $lRows")
  }
}
