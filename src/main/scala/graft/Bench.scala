package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are consumed with a `noop`-format write —
  * unlike `.count()`, which lets Catalyst prune the whole select list, noop
  * evaluates every output column, so scan-shaped queries are charged their
  * real cost.
  *
  * Each query runs SPARK_GRAFT_BENCH_REPEATS times (default 3) and the
  * reported per-query number is the MIN across repeats — a single-shot
  * timing is hostage to noisy neighbors (the round-5 artifact recorded ~4×
  * inflation under machine contention on unchanged code). Repeats then
  * continue ADAPTIVELY (to SPARK_GRAFT_BENCH_MAX_REPEATS, default 6) until
  * the two fastest runs agree within 10%: a min whose runner-up confirms it
  * is reproducible run-over-run, where a lucky/unlucky single min on a
  * sub-second query still carries GC-pause jitter. The max rides along
  * under `queries_max` so contention is visible rather than silently folded
  * in, and `wall` records total harness wall-clock (all repeats + setup) as
  * load context for the round artifact.
  *
  * CONTENTION GUARD: two consecutive round artifacts recorded garbage
  * because the whole box was contended for the entire run — min-of-repeats
  * cannot rescue that, so the artifact now carries the tells and a verdict.
  * Round 11 exposed a FOURTH failure mode the tells below are blind to: a
  * sustained burst spanning all of one query's repeats yields a SETTLED
  * min (two slow runs within 10%) with small spread — f2_json_extract
  * recorded 21.4 s vs 0.57 s quiet under `contended:false`. The harness now
  * also (a) samples /proc/loadavg per query into the streamed stderr lines,
  * (b) compares every settled min against the previous round's QUIET gate
  * artifact (`BENCH_GATE_r<k>.json`, or SPARK_GRAFT_BENCH_REF) and treats
  * any row >2× its reference (+0.3 s absolute) as a suspect regardless of
  * spread, (c) waits for loadavg to decay (≤60 s) before the suspect
  * re-run pass, and (d) records rows STILL >2× reference after the re-run
  * in `ref_inflated` so a comparer re-measures them on a quiet box instead
  * of reading a phantom regression. Original tells:
  *  - `loadavg_before` / `loadavg_after`: /proc/loadavg (1-min) sampled
  *    around the run — load already present BEFORE we start is someone
  *    else's;
  *  - `load_ratio`: wall / (repeats × Σ min) — how much longer the harness
  *    took than perfectly-repeatable timings explain;
  *  - `spread_ratio`: Σ max / Σ min across queries — repeat variance;
  *  - `contended`: true when any tell crosses its threshold (pre-existing
  *    load > half the cores, or either ratio > 3×). A flagged artifact
  *    should be RE-RUN on a quiet box, not compared round-over-round.
  *
  * KILL-PROOFING: a third artifact recorded NOTHING because the run blew
  * the driver's wall budget and was killed before the single end-of-run
  * println. The harness now survives that three ways:
  *  - every query's result is streamed to stderr the moment it settles
  *    (`{"bench_query":…}` lines), so even a SIGKILL mid-suite leaves a
  *    per-query record in the captured log;
  *  - an INTERNAL wall deadline (SPARK_GRAFT_BENCH_DEADLINE_SEC, default
  *    900 — set it comfortably under the external budget): past 60% of it
  *    adaptive repeats stop, past 80% only the first repeat of each query
  *    runs, past 100% no new query starts and the artifact is flushed with
  *    `"truncated": true` plus the names it skipped;
  *  - a JVM shutdown hook prints the final JSON from whatever completed if
  *    the normal path didn't get to (covers SIGTERM, e.g. `timeout`'s
  *    default signal, though not SIGKILL — the stderr stream covers that).
  */
object Bench {

  /** 1-minute load average, or -1 where /proc is unavailable. */
  private def loadAvg1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** REFERENCE ARTIFACT (round-11 verdict #1: a sustained co-tenant burst
    * spanning ALL of a query's repeats produces a settled-looking min —
    * two slow runs agreeing within 10% — that the spread guard cannot see;
    * f2_json_extract entered BENCH_r11 at 21.4 s vs 0.57 s quiet with
    * `contended:false`). The only signal that catches a settled-but-slow
    * row is history: the previous round's QUIET gate artifact. Loads
    * `SPARK_GRAFT_BENCH_REF` if set, else the highest-numbered
    * `BENCH_GATE_r<k>.json` in the working directory (the round gate
    * persists one per round). Returns (path, per-query min map). */
  private def loadRef(sfDir: String): (String, Map[String, Double]) = {
    val gate = """BENCH_GATE_r(\d+)\.json""".r
    val path: Option[String] = sys.env.get("SPARK_GRAFT_BENCH_REF").orElse {
      Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap(f => f.getName match {
          case gate(n) => Some((n.toInt, f.getPath))
          case _       => None
        }).sortBy(_._1).lastOption.map(_._2)
    }
    path.map { p =>
      try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val parsed = JsonMethods.parse(new java.io.File(p))
        // per-query seconds are SF-specific: a reference recorded at sf0.1
        // says nothing about an sf0.01 iteration run — silently comparing
        // would flag every row or none. Require the same sf dir.
        val refSf = parsed \ "sf" match { case JString(s) => s; case _ => "" }
        // NOT a non-local return: inside a closure `return` throws
        // NonLocalReturnControl, which a broad catch below would swallow
        // into a misleading "artifact unreadable" log (ADVICE r12).
        if (refSf != sfDir) {
          System.err.println(s"[bench] reference $p is for sf '$refSf', run is '$sfDir' — ref guard disabled")
          (p, Map.empty[String, Double])
        } else {
          val qs = parsed \ "queries" match {
            case JObject(fields) => fields.collect {
              case (k, JDouble(v))  => k -> v
              case (k, JInt(v))     => k -> v.toDouble
              case (k, JDecimal(v)) => k -> v.toDouble
            }.toMap
            case _ => Map.empty[String, Double]
          }
          (p, qs)
        }
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] reference artifact $p unreadable: $e")
        ("", Map.empty[String, Double])
      }
    }.getOrElse(("", Map.empty))
  }

  /** UNTIMED inter-query hygiene — see [[graft.run.BenchHygiene]] (shared
    * with Sf1Smoke since r17 so the two copies cannot drift). */
  private def interQueryCleanup(spark: SparkSession): Unit =
    graft.run.BenchHygiene.interQueryCleanup(spark)

  /** Cool-down before suspect re-runs (round-11 verdict: re-running
    * immediately re-measures the same co-tenant burst). Polls 1-min loadavg
    * every 5 s until it drops under `frac`×cores or `maxSec` elapses; the
    * 1-min average includes our own just-finished pass, so this is
    * best-effort decay, not a hard quiet guarantee. Returns seconds waited. */
  private def coolDown(maxSec: Int, cores: Double, frac: Double = 0.75): Int = {
    var waited = 0
    while (loadAvg1() > frac * cores && waited < maxSec) {
      Thread.sleep(5000); waited += 5
    }
    waited
  }

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - wall0) / 1e9
    val loadBefore = loadAvg1()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repeats = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt)
    val maxRepeats = math.max(repeats,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_REPEATS", "6").toInt)
    val deadline = sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "900").toDouble
    // results + failed + skip list are shared with the shutdown hook; guard
    // with a lock, print-once with a flag, so a signal mid-run still flushes.
    val results = new scala.collection.mutable.LinkedHashMap[String, (Double, Double)]
    val failed = new scala.collection.mutable.LinkedHashMap[String, String]
    val skipped = new scala.collection.mutable.ArrayBuffer[String]
    // full repeat history per query — the load-suspect pass re-examines it
    val timesMap = new scala.collection.mutable.LinkedHashMap[String, Seq[Double]]
    // queries whose min stayed UNCONFIRMED after the suspect re-run pass
    val loadSuspect = new scala.collection.mutable.ArrayBuffer[String]
    // queries whose settled min still exceeds 2× the previous quiet gate
    // artifact after the cool-down re-run → either a real regression or a
    // burst the spread guard can't see; either way the comparer must
    // re-measure on a quiet box instead of trusting the row
    val refInflated = new scala.collection.mutable.LinkedHashMap[String, Double]
    val (refFile, refMins) = loadRef(sfDir)
    if (refFile.nonEmpty)
      System.err.println(s"[bench] reference artifact: $refFile (${refMins.size} rows)")
    var cooldownSec = 0
    val printed = new java.util.concurrent.atomic.AtomicBoolean(false)

    def flush(truncated: Boolean): Unit = if (printed.compareAndSet(false, true)) {
      val (qs, qsMax, total, totalMax, failedJson, failedNames, skippedJson, nSkipped,
           suspectJson, nSuspect, refInflatedJson) =
        results.synchronized {
        (results.map { case (k, (mn, _)) => s"\"" + k + "\":" + mn }.mkString("{", ",", "}"),
         results.map { case (k, (_, mx)) => s"\"" + k + "\":" + mx }.mkString("{", ",", "}"),
         if (results.nonEmpty) results.values.map(_._1).sum else 0.0,
         if (results.nonEmpty) results.values.map(_._2).sum else 0.0,
         failed.map { case (k, e) => s"\"" + k + "\":\"" + e + "\"" }.mkString("{", ",", "}"),
         failed.keys.toList,
         skipped.map("\"" + _ + "\"").mkString("[", ",", "]"),
         skipped.length,
         loadSuspect.map("\"" + _ + "\"").mkString("[", ",", "]"),
         loadSuspect.length,
         refInflated.map { case (k, r) => s"\"" + k + s"""\":${f"$r%.2f"}""" }.mkString("{", ",", "}"))
      }
      val wall = elapsed
      val loadAfter = loadAvg1()
      val cores = Runtime.getRuntime.availableProcessors().toDouble
      val loadRatio = if (total > 0) wall / (repeats * total) else 0.0
      val spreadRatio = if (total > 0) totalMax / total else 0.0
      // Pre-existing load is the strongest tell: we sample BEFORE creating the
      // session, so >50% of the cores already busy means a contended box.
      val contended = (loadBefore > 0.5 * cores) || loadRatio > 3.0 || spreadRatio > 3.0
      val bigLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_max":$qsMax,"failed":$failedJson,"repeats":$repeats,"wall":$wall,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"cores":$cores,"load_ratio":${f"$loadRatio%.3f"},"spread_ratio":${f"$spreadRatio%.3f"},"contended":$contended,"truncated":$truncated,"skipped":$skippedJson,"load_suspect":$suspectJson,"ref_inflated":$refInflatedJson,"ref_file":"$refFile","cooldown_sec":$cooldownSec,"deadline":$deadline,"sf":"$sfDir"}"""
      println(bigLine)
      // The artifact capture keeps only an output TAIL, and the ~6 KB line
      // above beheads itself inside any 2 KB window — two rounds of driver
      // artifacts recorded `"parsed": null` for exactly this. Persist the
      // full line to a file too, so round-over-round per-query diffs never
      // depend on capture length (the compact summary below still serves
      // the tail window). Subset runs (SPARK_GRAFT_BENCH_ONLY) write a
      // separate PARTIAL file — round-11 verdict #2: an ad-hoc 5-query probe
      // used to overwrite the round's full gitignored artifact, destroying
      // it unrecoverably.
      val artifactPath =
        if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) "BENCH_LOCAL_PARTIAL.json"
        else "BENCH_LOCAL.json"
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(artifactPath), bigLine + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] artifact file write failed: $e") }
      // Per-query map in SHORT chunked stdout lines (≤ ~1 KB each) ahead of
      // the compact summary — each parses standalone, so however the capture
      // slices the stream, whole chunks survive.
      results.synchronized {
        val entries = results.toList.map { case (k, (mn, _)) => s"\"" + k + s"""\":${f"$mn%.3f"}""" }
        val nParts = math.max(1, (entries.length + 11) / 12)
        entries.grouped(12).zipWithIndex.foreach { case (chunk, i) =>
          // terminal "done" marker (r16 verdict #3): a reassembler can tell a
          // complete chunk set from one the capture window truncated.
          val done = if (i + 1 == nParts) ""","done":true""" else ""
          println(s"""{"bench_queries":1,"part":${i + 1},"of":$nParts,"q":${chunk.mkString("{", ",", "}")}$done}""")
        }
      }
      // Compact SECOND line (<500 bytes): the full line above is ~6 KB and
      // round artifacts keep only the last 2,000 chars of output, which
      // beheads it — five rounds of BENCH artifacts were unparseable for
      // exactly this. Everything a gate needs (totals, flags, failures, the
      // slowest queries) fits after the big line, inside any sane tail
      // window; tools/check_bench.py reads either.
      val top5 = results.synchronized {
        results.toList.sortBy(-_._2._1).take(5)
          .map { case (k, (mn, _)) => s"\"" + k + s"""\":${f"$mn%.2f"}""" }
          .mkString("{", ",", "}")
      }
      val failedList = failedNames.take(12).map("\"" + _ + "\"").mkString("[", ",", "]")
      val nRefInflated = results.synchronized(refInflated.size)
      println(s"""{"bench_summary":1,"total":${f"$total%.2f"},"n":${results.size},"n_failed":${failedNames.length},"failed":$failedList,"repeats":$repeats,"wall":${f"$wall%.1f"},"contended":$contended,"truncated":$truncated,"n_skipped":$nSkipped,"n_suspect":$nSuspect,"n_ref_inflated":$nRefInflated,"top5":$top5,"sf":"$sfDir"}""")
      // FINAL stdout line, sized to the driver's 2,000-char output tail
      // (r16 verdict #3): the full `{"metric":…}` line above is ~6 KB and
      // beheads itself inside that window — every driver BENCH artifact
      // since r10 recorded `parsed: null`. This line repeats the contract
      // keys (metric/value/unit/queries/sf) but carries only as many of the
      // SLOWEST per-query entries as fit in ~1,850 chars (the window minus
      // the runner's trailing "[success] …" line); `queries_omitted` counts
      // the fast rows that didn't fit and `queries_file` names the artifact
      // holding the complete map (also in the chunked lines above). The
      // totals are over ALL rows, not just the listed ones.
      val compactEntries = results.synchronized {
        results.toList.sortBy(-_._2._1)
          .map { case (k, (mn, _)) => s"\"" + k + s"""\":${f"$mn%.3f"}""" }
      }
      val qBudget = 1500
      val qSb = new StringBuilder
      var omitted = 0
      compactEntries.foreach { e =>
        if (qSb.length + e.length + 1 <= qBudget) {
          if (qSb.nonEmpty) qSb.append(','); qSb.append(e)
        } else omitted += 1
      }
      println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":{$qSb},"queries_omitted":$omitted,"queries_file":"$artifactPath","n":${results.size},"n_failed":${failedNames.length},"repeats":$repeats,"wall":${f"$wall%.1f"},"contended":$contended,"truncated":$truncated,"sf":"$sfDir"}""")
      System.out.flush()
    }
    val hook = new Thread(() => flush(truncated = true))
    Runtime.getRuntime.addShutdownHook(hook)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: session init, codegen compiler, parquet reader and the
    // noop sink all spin up here instead of inside the first measured query.
    // The documents/embeddings payload columns are touched once too, so the
    // cold first read (page cache + decompression JIT) isn't charged to
    // whichever corpus query happens to run first in map order.
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/documents.parquet")
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    // Untimed shared-fixture setup (s1 snapshot, side dirs, dlq first pass):
    // measured bodies charge query execution only.
    try SparkEntry.prepare(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] prepare failed: $e") }

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 runs a subset — local iteration knob, the
    // driver never sets it so round artifacts always carry the full suite.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    var truncated = false
    SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      if (elapsed >= deadline) {
        truncated = true
        // same monitor as flush(): the shutdown hook reads `skipped` under
        // results.synchronized, so the append must hold THAT lock — a
        // different monitor would let the hook iterate a mid-resize buffer
        results.synchronized { skipped += name }
      } else {
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        // A throw anywhere (analysis error, runtime failure) marks the query
        // FAILED and excludes it from results — a query that dies at analysis
        // in 60 ms must never enter the artifact as a 0.06 s success (that is
        // exactly how round 8's 10 broken queries hid inside BENCH_r08).
        var failure: Option[Throwable] = None
        def runOnce(): Unit = {
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            times += (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            failure = Some(e)
            System.err.println(s"[bench] $name failed: $e")
          }
        }
        runOnce()
        // past 80% of the deadline, first-repeat numbers only: a degraded
        // min beats a missing artifact
        while (failure.isEmpty && times.length < repeats && elapsed < 0.8 * deadline) runOnce()
        def settled: Boolean = {
          val s = times.sorted
          s.length >= 2 && (s(1) - s(0)) <= 0.10 * s(1)
        }
        while (failure.isEmpty && !settled && times.length < maxRepeats &&
          elapsed < 0.6 * deadline) runOnce()
        failure match {
          case Some(e) =>
            results.synchronized { failed(name) = e.getClass.getName }
            System.err.println(s"""{"bench_query":"$name","failed":"${e.getClass.getName}","elapsed":${f"$elapsed%.1f"}}""")
          case None =>
            results.synchronized {
              results(name) = (times.min, times.max)
              timesMap(name) = times.toSeq
            }
            // streamed per-query record: survives any kill after this point.
            // `load` is the 1-min loadavg sampled AS THIS QUERY SETTLED —
            // round-11 verdict #1: suite-level before/after samples miss a
            // mid-run co-tenant burst entirely; the per-row sample pins
            // which rows ran under load.
            System.err.println(s"""{"bench_query":"$name","min":${times.min},"max":${times.max},"n":${times.length},"load":${loadAvg1()},"elapsed":${f"$elapsed%.1f"}}""")
        }
        System.err.flush()
        interQueryCleanup(spark)
      }
      }

    // LOAD-SUSPECT RE-RUN PASS (round-9 verdict #1: five queries recorded
    // 2–5× their quiet cost because a co-tenant burst hit every repeat and
    // the suite-level `contended` flag, sampled before/after the whole run,
    // missed it). A per-query max/min spread > 2.5× that never SETTLED (two
    // fastest within 10%) is the tell; those queries — and exactly those —
    // get extra repeats while budget remains. A min confirmed by a second
    // run within 10% is reproducible no matter how slow the worst repeat
    // was; a query still unconfirmed after the pass is recorded in
    // `load_suspect` so a comparer discounts it instead of reading a
    // phantom regression.
    val suspectSpread = 2.5
    if (!truncated) {
      def settledOf(ts: Seq[Double]): Boolean = {
        val s = ts.sorted
        s.length >= 2 && (s(1) - s(0)) <= 0.10 * s(1)
      }
      // A row is REF-INFLATED when its min exceeds 2× the previous round's
      // quiet gate value by more than 0.3 s absolute (the absolute floor
      // keeps 0.05→0.12 s jitter on trivial rows out of the suspect set).
      // This catches the settled-but-slow failure mode the spread guard is
      // structurally blind to (round-11 verdict #1) — regardless of spread.
      def refHot(name: String, mn: Double): Boolean =
        refMins.get(name).exists(ref => mn > 2.0 * ref && mn - ref > 0.3)
      val suspects = results.synchronized {
        timesMap.toList.collect { case (n, ts)
          if (ts.max / ts.min > suspectSpread && !settledOf(ts)) || refHot(n, ts.min) => n }
      }
      // Re-running immediately re-measures the same burst; wait for the
      // 1-min loadavg to decay first (bounded — our own pass inflates it).
      if (suspects.nonEmpty) {
        cooldownSec = coolDown(maxSec = 60, cores = Runtime.getRuntime.availableProcessors().toDouble)
        System.err.println(s"""{"bench_cooldown":$cooldownSec,"n_suspects":${suspects.length},"loadavg":${loadAvg1()}}""")
      }
      suspects.foreach { name =>
        interQueryCleanup(spark)
        // The re-run executes right after the main pass on the same box: if
        // the co-tenant burst is still active these repeats can't settle
        // either. Sampling loadavg here and recording it in the rerun line
        // lets a comparer see whether the re-runs themselves were contended.
        val rerunLoad = loadAvg1()
        var ts = results.synchronized(timesMap(name))
        var extra = 0
        // keep re-running while the row is either unsettled OR still above
        // 2× the quiet reference — a settled-but-inflated min only clears
        // when a post-cool-down repeat lands back near the reference
        while ((!settledOf(ts) || refHot(name, ts.min)) && extra < 3 && elapsed < 0.9 * deadline) {
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            ts = ts :+ (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[bench] suspect re-run of $name failed: $e")
            extra = 3 // keep the original numbers; do not loop on a failure
          }
          extra += 1
        }
        results.synchronized {
          timesMap(name) = ts
          results(name) = (ts.min, ts.max)
          if (!settledOf(ts)) loadSuspect += name
          // still >2× the quiet reference after the cool-down re-run: record
          // the ratio so a comparer re-measures instead of reading a phantom
          // regression (or misses a real one silently)
          refMins.get(name).foreach { ref =>
            if (ts.min > 2.0 * ref && ts.min - ref > 0.3) refInflated(name) = ts.min / ref
          }
        }
        System.err.println(s"""{"bench_query":"$name","min":${ts.min},"max":${ts.max},"n":${ts.length},"rerun":true,"settled":${settledOf(ts)},"ref":${refMins.getOrElse(name, -1.0)},"loadavg":$rerunLoad,"elapsed":${f"$elapsed%.1f"}}""")
        System.err.flush()
      }
    }
    flush(truncated)
    Runtime.getRuntime.removeShutdownHook(hook)
    spark.stop()
  }
}
